"""Deletes (tombstone anti-join) + MoreLikeThis behavior.

Mirrors test/Lucene.Net.Test/Index/TestIndexWriterDelete.cs (deleted docs
invisible to every query path) and contrib MoreLikeThis semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher


@pytest.fixture(scope="module")
def corpus_index(spark):
    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

    docs = with_doc_ids(corpus_df(spark, 300, partitions=4),
                        ("repo", "path")).cache()
    return build_segmented_index(spark, docs, text_col="content",
                                 lang_col="lang")


def test_deleted_docs_invisible(spark, corpus_index):
    s = Searcher(corpus_index)
    q = ast.Term("index", field="content")
    before = {r["doc_id"] for r in s.search(q, 50).collect()}
    victims = list(sorted(before))[:3]
    dead = spark.createDataFrame([(v,) for v in victims], "doc_id long")
    s2 = Searcher(corpus_index.with_deletes(dead))
    after = {r["doc_id"] for r in s2.search(q, 50).collect()}
    assert not (after & set(victims))
    # count drops by exactly the matching victims
    assert s2.count(q) == s.count(q) - len(victims)
    # scores of surviving docs unchanged (deletes don't touch df/stats
    # until a merge purges them — reference semantics: .del bitmap only)
    n = s.count(q)
    sb = {r["doc_id"]: r["score"] for r in s.search(q, n).collect()}
    sa = {r["doc_id"]: r["score"] for r in s2.search(q, n).collect()}
    for d, sc in sa.items():
        assert sb[d] == sc


def test_deletes_accumulate(spark, corpus_index):
    d1 = spark.createDataFrame([(0,)], "doc_id long")
    d2 = spark.createDataFrame([(1,)], "doc_id long")
    idx = corpus_index.with_deletes(d1).with_deletes(d2)
    got = {r["doc_id"] for r in idx.tombstones.collect()}
    assert got == {0, 1}


def test_mlt_excludes_source_and_ranks(spark, corpus_index):
    s = Searcher(corpus_index)
    hits = s.more_like_this(5, max_terms=5, k=10, field="content").collect()
    assert len(hits) == 10
    assert all(r["doc_id"] != 5 for r in hits)
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)


def test_ivf_subset_of_exact(spark):
    from lucenenet_spark.operators import ann

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    exact = [tuple(r) for r in
             ann.cosine_topk(emb, qv, k=10, exclude_id=0).collect()]
    approx = [tuple(r) for r in
              ann.ivf_topk(emb, qv, k=10, nlist=16, nprobe=16,
                           exclude_id=0).collect()]
    # probing ALL cells must recover the exact result
    assert approx == exact
    some = ann.ivf_topk(emb, qv, k=10, nlist=16, nprobe=4, exclude_id=0).collect()
    assert 0 < len(some) <= 10
