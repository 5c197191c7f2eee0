"""Term vectors WITH_POSITIONS_OFFSETS (index/vectors.py,
TermVectorsWriter.cs / Field.cs:100) + FastVectorHighlighter
(operators/fvh.py, src/contrib/Lucene.Net.Contrib.FastVectorHighlighter/).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.analysis.tokenizers import (
    _std_transform,
    tokenize_standard,
    tokenize_standard_offsets,
)
from lucenenet_spark.index.vectors import term_vectors_with_offsets
from lucenenet_spark.operators import fvh, highlight
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher

DOCS = [
    "Spark merges the segment postings while the table scans keep running",
    "The spark job re-runs a merge wave over the spark segment table",
    "No relevant words at the start. But spark appears late, after "
    "sixteen or more filler tokens pad the first fragment window out; "
    "spark spark spark cluster together in the second window here",
    "O'Reilly's guide to the U.S.A. spark deployment at AT&T scale",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)],
        "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def vectors(corpus):
    return term_vectors_with_offsets(corpus, text_col="text").cache()


def test_offsets_tokenizer_agrees_with_standard():
    for t in DOCS:
        plain = tokenize_standard(t)
        with_off = [(term, pos) for term, pos, _, _ in
                    tokenize_standard_offsets(t)]
        assert plain == with_off
        for term, _, s, e in tokenize_standard_offsets(t):
            assert _std_transform(t[s:e].lower()) == term


def test_vector_positions_match_postings(spark, corpus, vectors):
    from lucenenet_spark.index.segments import build_segmented_index

    idx = build_segmented_index(spark, corpus, text_col="text",
                                id_col="doc_id", field_name="text")
    post = {(r["doc_id"], r["term"]): list(r["positions"])
            for r in idx.postings.collect()}
    vec = {(r["doc_id"], r["term"]): list(r["positions"])
           for r in vectors.collect()}
    assert vec == post
    # offsets really slice the stored surface form
    for r in vectors.collect():
        text = DOCS[r["doc_id"]]
        for s, e in zip(r["starts"], r["ends"]):
            assert _std_transform(text[s:e].lower()) == r["term"]
        assert list(r["positions"]) == sorted(r["positions"])
        assert r["freq"] == len(r["positions"])


def test_fvh_selection_parity_with_token_highlighter(spark, corpus, vectors):
    """FVH must pick the IDENTICAL (frag_idx, frag_score) as the
    re-tokenizing Highlighter — same window semantics, different
    renderer."""
    from lucenenet_spark.index.segments import build_segmented_index

    idx = build_segmented_index(spark, corpus, text_col="text",
                                id_col="doc_id", field_name="text")
    hits = Searcher(idx).search(ast.Term("spark"), 10)
    a = {r["doc_id"]: (r["frag_idx"], r["frag_score"]) for r in
         highlight.best_fragments(hits, corpus, ["spark"]).collect()}
    b = {r["doc_id"]: (r["frag_idx"], r["frag_score"]) for r in
         fvh.best_fragments_fv(hits, vectors, corpus, ["spark"]).collect()}
    assert a == b and len(b) >= 3
    # doc 2's best window is the SECOND fragment (3 sparks cluster there)
    assert b[2][0] == 1 and b[2][1] == 3


def test_fvh_snippet_is_a_stored_slice_with_markup(spark, corpus, vectors):
    from lucenenet_spark.index.segments import build_segmented_index

    idx = build_segmented_index(spark, corpus, text_col="text",
                                id_col="doc_id", field_name="text")
    hits = Searcher(idx).search(ast.Term("spark"), 10)
    rows = fvh.best_fragments_fv(hits, vectors, corpus, ["spark"]).collect()
    for r in rows:
        text = DOCS[r["doc_id"]]
        plain = r["snippet"].replace("<b>", "").replace("</b>", "")
        # rendering slices the ORIGINAL text: casing/punctuation intact
        assert plain in text
        assert r["snippet"].count("<b>") == r["frag_score"]
        inner = [w for w in r["snippet"].split("<b>")[1:]]
        for seg in inner:
            surface = seg.split("</b>")[0]
            assert _std_transform(surface.lower()) == "spark"
    # doc 0: "Spark" keeps its original capital S in the snippet
    r0 = next(r for r in rows if r["doc_id"] == 0)
    assert "<b>Spark</b>" in r0["snippet"]


# ------------- contrib/Highlighter formatting extras (round 4)


def test_null_fragmenter_whole_field(spark):
    from pyspark.sql import functions as F

    from lucenenet_spark.operators.highlight import highlight_expr

    df = spark.createDataFrame(
        [("merge batch merge stream",)], "text string")
    idx, score, snip = highlight_expr(F.col("text"), ["merge"],
                                      frag_tokens=None)
    r = df.select(idx.alias("i"), score.alias("s"),
                  snip.alias("snip")).collect()[0]
    assert r["i"] == 0 and r["s"] == 2
    assert r["snip"] == "<b>merge</b> batch <b>merge</b> stream"


def test_html_encode_entities(spark):
    from pyspark.sql import functions as F

    from lucenenet_spark.operators.highlight import html_encode

    df = spark.createDataFrame([('a<b>&"c"',)], "t string")
    assert df.select(html_encode(F.col("t")).alias("e")).collect()[0]["e"] \
        == "a&lt;b&gt;&amp;&quot;c&quot;"


def test_gradient_color_golden(spark):
    """Hand-derived GradientFormatter points (GetColorVal math,
    GradientFormatter.cs:160-170): #000000->#FF0000 at maxScore 10."""
    from pyspark.sql import functions as F

    from lucenenet_spark.operators.highlight import gradient_color

    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,), (25.0,)],
                               "s double")
    got = [r["c"] for r in df.select(gradient_color(
        F.col("s"), 10.0, "#000000", "#FF0000").alias("c")).collect()]
    assert got == ["#000000", "#7F0000", "#FF0000", "#FF0000"]  # clamp


def test_gradient_wrap_zero_score_passthrough(spark):
    from pyspark.sql import functions as F

    from lucenenet_spark.operators.highlight import gradient_wrap

    df = spark.createDataFrame([("merge",), ("other",)], "t string")
    out = {r["t"]: r["w"] for r in df.select(
        "t", gradient_wrap(F.col("t"), {"merge": 10.0}, 10.0,
                           "#000000", "#FF0000").alias("w")).collect()}
    assert out["other"] == "other"
    assert out["merge"] == '<font color="#FF0000">merge</font>'


def test_span_fragmenter_never_cuts_a_match(spark):
    """SimpleSpanFragmenter contract: the chosen window contains the
    span match WHOLE, even when the phrase sits far into the doc."""
    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.operators.highlight import span_best_fragments
    from lucenenet_spark.plans import ast
    from lucenenet_spark.plans.lowering import Searcher
    from lucenenet_spark.sources.corpus import with_doc_ids

    filler = " ".join(f"pad{i}" for i in range(30))
    df = spark.createDataFrame(
        [("r", "a", filler + " merge group part trailing words here"),
         ("r", "b", "no match at all in this one")],
        "repo string, path string, content string")
    idx = build_segmented_index(spark, with_doc_ids(df),
                                text_col="content")
    s = Searcher(idx)
    q = ast.SpanNear((ast.SpanTerm("merge", field="content"),
                      ast.SpanTerm("group", field="content"),
                      ast.SpanTerm("part", field="content")),
                     slop=0, in_order=True)
    rows = span_best_fragments(s, q, frag_tokens=8,
                               text_col="content").collect()
    assert len(rows) == 1  # only the matching doc
    r = rows[0]
    assert r["frag_start"] == 30           # window STARTS at the span
    assert r["n_spans_in"] == 1
    assert "<b>merge</b> <b>group</b> <b>part</b>" in r["snippet"]


def test_extract_terms_and_idf_weights(spark):
    """QueryTermExtractor: tree walk collects (term, boost) pairs —
    MUST_NOT only under prohibited; idf weighting multiplies by
    ln(N/(df+1))+1 with df capped at N."""
    import math

    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.operators.highlight import (extract_terms,
                                                     idf_weighted_terms)
    from lucenenet_spark.plans import ast
    from lucenenet_spark.plans.lowering import Searcher
    from lucenenet_spark.sources.corpus import with_doc_ids

    q = ast.Bool(must=(ast.Term("merge", boost=2.0),),
                 should=(ast.Phrase(("group", "part")),),
                 must_not=(ast.Term("vector"),))
    assert extract_terms(q) == [("group", 1.0), ("merge", 2.0),
                                ("part", 1.0)]
    assert ("vector", 1.0) in extract_terms(q, prohibited=True)

    df = spark.createDataFrame(
        [("r", "a", "merge group part"), ("r", "b", "merge only"),
         ("r", "c", "merge again too")],
        "repo string, path string, content string")
    idx = build_segmented_index(spark, with_doc_ids(df),
                                text_col="content")
    w = idf_weighted_terms(
        Searcher(idx),
        ast.Bool(must=(ast.Term("merge", field="content", boost=2.0),
                       ast.Term("group", field="content"))),
        field="content")
    n = 3
    assert w["merge"] == pytest.approx(2.0 * (math.log(n / 4.0) + 1.0))
    assert w["group"] == pytest.approx(1.0 * (math.log(n / 2.0) + 1.0))
