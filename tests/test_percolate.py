"""Percolator semantics (operators/percolate.py — the MemoryIndex
analogue, src/contrib/Memory/MemoryIndex.cs): registered-query matching
against a document frame, all-JVM compilation."""

import pytest

from lucenenet_spark.operators.percolate import percolate
from lucenenet_spark.plans import ast


def _matches(spark, docs, queries):
    df = spark.createDataFrame(docs, ["doc_id", "text", "n_chars"])
    rows = percolate(df, queries).collect()
    return {(r.doc_id, r.query_id) for r in rows}


DOCS = [
    (0, "spark merges the segment table", 30),
    (1, "a hash table keeps the postings", 31),
    (2, "table the hash stays apart", 26),      # stopword hole between
    (3, "batch merge and batch scan", 26),
    (4, "vector merge batch pipeline", 27),
    (5, "scan scat scorn", 15),
]


def test_term_and_stopword_query(spark):
    got = _matches(spark, DOCS, {
        "t": ast.Term("table"),
        "stop": ast.Term("the"),   # stopword: indexed nowhere, matches nothing
    })
    assert got == {(0, "t"), (1, "t"), (2, "t")}


def test_phrase_requires_adjacency_with_holes(spark):
    # doc1 has "hash table" adjacent; doc2 has "table [the] hash" — the
    # removed stopword leaves a POSITION GAP, so slop=0 must not match
    # (ExactPhraseScorer semantics)
    got = _matches(spark, DOCS, {
        "p": ast.Phrase(("hash", "table")),
        "gap": ast.Phrase(("table", "hash")),
    })
    assert (1, "p") in got
    assert (2, "gap") not in got
    # explicit offsets spanning the hole DO match: table@0, hash@2
    got2 = _matches(spark, DOCS, {
        "holed": ast.Phrase(("table", "hash"), offsets=(0, 2)),
    })
    assert (2, "holed") in got2


def test_bool_msm_and_prohibited(spark):
    got = _matches(spark, DOCS, {
        "msm2": ast.Bool(should=(ast.Term("batch"), ast.Term("merge"),
                                 ast.Term("scan")), min_should_match=2),
        "not": ast.Bool(must=(ast.Term("merge"),),
                        must_not=(ast.Term("vector"),)),
    })
    assert (3, "msm2") in got and (4, "msm2") in got
    assert (1, "msm2") not in got
    assert (4, "not") not in got and (3, "not") in got
    # pure-should bool needs >=1 match even at msm=0 (BooleanScorer2)
    got2 = _matches(spark, DOCS, {
        "any": ast.Bool(should=(ast.Term("zzz"),)),
    })
    assert not got2


def test_multiterm_and_fuzzy(spark):
    got = _matches(spark, DOCS, {
        "pre": ast.Prefix("sca"),
        "wild": ast.Wildcard("s?an"),
        "fuzz": ast.Fuzzy("scan", min_similarity=0.5),
        "num": ast.NumericRange("n_chars", 27, 40),
    })
    assert (5, "pre") in got and (3, "pre") in got
    assert (5, "wild") in got                     # scan matches s?an
    # fuzzy budget floor(0.5*4)=2: scat(1), scorn(2 vs min-len 4 -> budget 2)
    assert (5, "fuzz") in got
    assert {(d, q) for d, q in got if q == "num"} == {
        (0, "num"), (1, "num"), (4, "num")}


def test_sloppy_phrase_rejected_at_compile_time(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "n_chars"])
    with pytest.raises(NotImplementedError):
        percolate(df, {"s": ast.Phrase(("a", "b"), slop=2)})


def test_plan_is_map_only(spark):
    """The percolator must stay a narrow scan: no Exchange in the plan."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "n_chars"])
    plan = percolate(df, {"t": ast.Term("table")})._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_streaming_percolator(spark, tmp_path):
    """percolate() applied directly to a readStream micro-batch pipeline:
    a pure narrow projection, so the same call works on a file stream —
    the alert/routing deployment shape."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text", "n_chars"])
    src = tmp_path / "stream_in"
    src.mkdir()
    docs.where("doc_id < 3").write.parquet(str(src / "w0"))
    docs.where("doc_id >= 3").write.parquet(str(src / "w1"))

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "w*")))
    matched = percolate(stream, {
        "alert_table": ast.Term("table"),
        "alert_batchmerge": ast.Bool(must=(ast.Term("batch"),
                                           ast.Term("merge"))),
    })
    q = (matched.writeStream.format("memory")
         .queryName("perc_out").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    q.stop()
    got = {(r.doc_id, r.query_id)
           for r in spark.sql("SELECT * FROM perc_out").collect()}
    assert got == {(0, "alert_table"), (1, "alert_table"),
                   (2, "alert_table"), (3, "alert_batchmerge"),
                   (4, "alert_batchmerge")}


def test_chunked_matches_fused(spark):
    """Past chunk_size, the bounded-width unioned projections must
    produce exactly the fused single-Project output (VERDICT r4 watch
    #4: percolator K-scaling)."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text", "n_chars"])
    queries = {}
    for i, w in enumerate(["table", "batch", "merge", "scan", "spark",
                           "rollup", "stream", "join"]):
        queries[f"q{i:02d}_{w}"] = ast.Term(w)
    queries["q90_bool"] = ast.Bool(must=(ast.Term("batch"),),
                                   must_not=(ast.Term("scan"),))
    queries["q91_prefix"] = ast.Prefix("mer")
    fused = {(r.doc_id, r.query_id)
             for r in percolate(docs, queries).collect()}
    chunked = {(r.doc_id, r.query_id)
               for r in percolate(docs, queries, chunk_size=3).collect()}
    assert chunked == fused and fused


def test_chunked_plan_width_bounded(spark):
    """Each union branch's Project carries at most chunk_size compiled
    conditions — the K-wide expression tree is gone."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text", "n_chars"])
    queries = {f"t{i:03d}": ast.Term(f"term{i}") for i in range(40)}
    out = percolate(docs, queries, chunk_size=10)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Union") >= 1
    # every generator arm holds <= 10 whens: no single line mentions
    # more than 10 distinct registered qids
    for line in plan.splitlines():
        hits = sum(1 for i in range(40) if f"t{i:03d}" in line)
        assert hits <= 10, f"{hits} qids fused into one node"
