"""NRT streaming index: micro-batch segment publication == batch build.

Behavioral mirror of the reference's NRT tests
(test/Lucene.Net.Test/Index/TestIndexWriterReader.cs): documents added in
increments are visible to a reader without a full rebuild, and results
equal a from-scratch batch index over the same corpus.
"""

from __future__ import annotations

import os

import pytest

from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher


@pytest.fixture()
def corpus_waves(spark, tmp_path):
    """Three parquet drops of the corpus — the streaming source input."""
    from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

    docs = with_doc_ids(corpus_df(spark, 240, partitions=4),
                        ("repo", "path")).cache()
    src = tmp_path / "incoming"
    src.mkdir()
    for i in range(3):
        wave = docs.where((docs.doc_id % 3) == i)
        wave.write.mode("overwrite").parquet(str(src / f"wave_{i}"))
    return docs, str(src)


def test_stream_matches_batch(spark, corpus_waves, tmp_path):
    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.streaming import nrt

    docs, src = corpus_waves
    index_dir = str(tmp_path / "nrt_index")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(os.path.join(src, "wave_*"))
    )
    q = nrt.start_indexing_stream(
        stream, index_dir, ckpt, text_col="content", lang_col="lang")
    q.awaitTermination(120)

    idx = nrt.load_nrt_index(spark, index_dir, stored=docs)
    batch = build_segmented_index(spark, docs, text_col="content",
                                  lang_col="lang")
    assert idx.n_docs == batch.n_docs == 240
    assert idx.avgdl == pytest.approx(batch.avgdl)

    s_nrt, s_batch = Searcher(idx), Searcher(batch)
    queries = [
        ast.Term("index", field="content"),
        ast.Bool(must=(ast.Term("index", field="content"),
                       ast.Term("merge", field="content"))),
        ast.Prefix("se", field="content"),
    ]
    for qq in queries:
        a = [tuple(r) for r in s_nrt.search(qq, 10).collect()]
        b = [tuple(r) for r in s_batch.search(qq, 10).collect()]
        assert a == b, qq

    # ---- compaction keeps results identical and shrinks segment count
    pre = idx.n_segments()
    nrt.compact(spark, index_dir, target_segments=1)
    idx2 = nrt.load_nrt_index(spark, index_dir, stored=docs)
    assert idx2.n_segments() == 1 <= pre
    for qq in queries:
        a = [tuple(r) for r in Searcher(idx2).search(qq, 10).collect()]
        b = [tuple(r) for r in s_batch.search(qq, 10).collect()]
        assert a == b, qq


def test_compact_crash_window_is_readable(spark, corpus_waves, tmp_path):
    """Simulate a crash BETWEEN compaction publication and cleanup: the
    new generation dir (manifest included) coexists with the superseded
    batch dirs + their stats files. The loader must see exactly one
    generation — no duplicate docs, same stats (the ADVICE.md atomic-swap
    gap)."""
    import glob
    import shutil

    from lucenenet_spark.streaming import nrt

    docs, src = corpus_waves
    index_dir = str(tmp_path / "nrt_index")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(os.path.join(src, "wave_*"))
    )
    nrt.start_indexing_stream(
        stream, index_dir, ckpt, text_col="content",
        lang_col="lang").awaitTermination(120)

    before = nrt.load_nrt_index(spark, index_dir, stored=docs)
    n_docs, avgdl = before.n_docs, before.avgdl

    # snapshot the pre-compaction batch dirs, compact, then restore them
    # NEXT TO the new generation == crash before cleanup
    segroot = os.path.join(index_dir, "segments")
    saved = {}
    for d in glob.glob(os.path.join(segroot, "batch_*")):
        saved[d] = str(tmp_path / ("save_" + os.path.basename(d)))
        shutil.copytree(d, saved[d])
    stats_saved = {}
    for p in glob.glob(os.path.join(index_dir, "stats", "batch_*.json")):
        with open(p) as f:
            stats_saved[p] = f.read()
    nrt.compact(spark, index_dir, target_segments=1)
    for orig, copy in saved.items():
        if not os.path.exists(orig):
            shutil.copytree(copy, orig)
    for p, body in stats_saved.items():
        if not os.path.exists(p):
            with open(p, "w") as f:
                f.write(body)

    after = nrt.load_nrt_index(spark, index_dir, stored=docs)
    assert after.n_docs == n_docs
    assert after.avgdl == pytest.approx(avgdl)
    assert after.n_segments() == 1  # only the compacted generation is live
    q = ast.Term("index", field="content")
    a = [tuple(r) for r in Searcher(after).search(q, 10).collect()]
    b = [tuple(r) for r in Searcher(before).search(q, 10).collect()]
    assert a == b


def test_stream_resume_after_compact_cannot_clobber_generation(
        spark, corpus_waves, tmp_path):
    """Regression (ADVICE r2 high): compaction used to publish as
    batch_{max_live+1} — exactly the id a resumed stream's next
    micro-batch claims, and index_batch overwrites its own dir, silently
    destroying the compacted generation. Generations now live in gen_*;
    replay that exact sequence and verify nothing is lost."""
    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.streaming import nrt

    docs, _ = corpus_waves
    index_dir = str(tmp_path / "nrt_index")
    waves = [docs.where((docs.doc_id % 3) == i) for i in range(3)]

    nrt.index_batch(waves[0], 0, index_dir, text_col="content",
                    lang_col="lang")
    nrt.index_batch(waves[1], 1, index_dir, text_col="content",
                    lang_col="lang")
    nrt.compact(spark, index_dir, target_segments=1)
    # the resumed stream's next batch id is 2 — under the old scheme this
    # dir name WAS the compacted generation
    nrt.index_batch(waves[2], 2, index_dir, text_col="content",
                    lang_col="lang")

    idx = nrt.load_nrt_index(spark, index_dir, stored=docs)
    batch = build_segmented_index(spark, docs, text_col="content",
                                  lang_col="lang")
    assert idx.n_docs == 240
    assert idx.avgdl == pytest.approx(batch.avgdl)
    q = ast.Term("index", field="content")
    a = [tuple(r) for r in Searcher(idx).search(q, 10).collect()]
    b = [tuple(r) for r in Searcher(batch).search(q, 10).collect()]
    assert a == b


def test_loader_excludes_batch_with_missing_stats(spark, corpus_waves,
                                                  tmp_path):
    """Regression (ADVICE r2 medium): a batch whose stats file is missing
    (crash between parquet write and stats write) must be excluded from
    the SEGMENT read too — postings and N/avgdl cover the same doc set."""
    from lucenenet_spark.streaming import nrt

    docs, _ = corpus_waves
    index_dir = str(tmp_path / "nrt_index")
    waves = [docs.where((docs.doc_id % 3) == i) for i in range(2)]
    nrt.index_batch(waves[0], 0, index_dir, text_col="content",
                    lang_col="lang")
    nrt.index_batch(waves[1], 1, index_dir, text_col="content",
                    lang_col="lang")
    os.remove(os.path.join(index_dir, "stats", "batch_00000001.json"))

    idx = nrt.load_nrt_index(spark, index_dir, stored=docs)
    n0 = waves[0].count()
    assert idx.n_docs == n0
    # every doc with postings is accounted for in the stats
    assert idx.postings_nopos.select("doc_id").distinct().count() <= n0
