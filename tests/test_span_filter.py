"""SpanQueryFilter / SpanFilterResult / CachingSpanFilter analogues:
per-doc match positions alongside the doc id set, and per-index-
generation memoization through the contrib/Core SegmentCache."""

from __future__ import annotations

import pytest

from lucenenet_spark.index.segments import build_segmented_index
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher


@pytest.fixture(scope="module")
def idx(spark):
    from lucenenet_spark.sources.corpus import with_doc_ids

    df = spark.createDataFrame(
        [("r", "d0", "alpha beta gamma alpha beta"),
         ("r", "d1", "beta alpha"),
         ("r", "d2", "gamma gamma gamma")],
        "repo string, path string, content string")
    return build_segmented_index(spark, with_doc_ids(df),
                                 text_col="content")


def _by_path(idx):
    return {r["path"]: r["doc_id"]
            for r in idx.stored.select("path", "doc_id").collect()}


def test_positions_and_docidset(idx):
    """BitSpans contract (SpanQueryFilter.cs:67-87): every matching doc
    appears once with its sorted (start, end) list."""
    s = Searcher(idx)
    q = ast.SpanNear((ast.SpanTerm("alpha", field="content"),
                      ast.SpanTerm("beta", field="content")),
                     slop=0, in_order=True)
    rows = {r["doc_id"]: [(p["start"], p["end"]) for p in r["positions"]]
            for r in s.span_filter_result(q).collect()}
    bp = _by_path(idx)
    # d0: "alpha beta ... alpha beta" -> ordered adjacent matches at
    # (0,2) and (3,5); d1 has beta BEFORE alpha (no ordered match)
    assert rows == {bp["d0"]: [(0, 2), (3, 5)]}


def test_span_term_positions(idx):
    s = Searcher(idx)
    rows = {r["doc_id"]: [(p["start"], p["end"]) for p in r["positions"]]
            for r in s.span_filter_result(
                ast.SpanTerm("gamma", field="content")).collect()}
    bp = _by_path(idx)
    assert rows == {bp["d0"]: [(2, 3)], bp["d2"]: [(0, 1), (1, 2), (2, 3)]}


def test_caching_span_filter(idx, spark):
    """CachingSpanFilter: same (index, query) -> the SAME memoized frame;
    a different query misses; the weak key scopes entries per index
    generation."""
    s = Searcher(idx)
    q = ast.SpanTerm("alpha", field="content")
    a = s.cached_span_filter_result(q)
    b = s.cached_span_filter_result(ast.SpanTerm("alpha", field="content"))
    assert a is b  # equal queries share one repr key
    c = s.cached_span_filter_result(ast.SpanTerm("beta", field="content"))
    assert c is not a
    # a second searcher over the SAME index generation shares the cache
    assert Searcher(idx).cached_span_filter_result(q) is a
