"""Ord/ReverseOrdFieldSource semantics (Search/Function/
OrdFieldSource.cs:26-35, ReverseOrdFieldSource.cs:85): 1-based
lexicographic rank of the doc's value among distinct values, missing ->
ord 0, reverse = (nDistinct+1) - ord (missing scores MAX — reference
quirk)."""

from __future__ import annotations

import pytest

from lucenenet_spark.index.segments import build_segmented_index
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher


@pytest.fixture(scope="module")
def idx(spark):
    from lucenenet_spark.sources.corpus import with_doc_ids

    df = spark.createDataFrame(
        [("r", "d0", "alpha text", "pear"),
         ("r", "d1", "beta text", "apple"),
         ("r", "d2", "gamma text", "banana"),
         ("r", "d3", "delta text", None),
         ("r", "d4", "epsilon text", "apple")],
        "repo string, path string, content string, fruit string")
    return build_segmented_index(spark, with_doc_ids(df),
                                 text_col="content",
                                 keyword_cols={"fruit": "fruit"})


def _scores(idx, q):
    s = Searcher(idx)
    return {r["doc_id"]: r["score"] for r in s.search(q, 10).collect()}


def test_ord_doc_example(idx):
    """The doc-comment example (OrdFieldSource.cs:35):
    ord(apple)=1, ord(banana)=2, ord(pear)=3; missing=0."""
    by_path = {r["path"]: r["doc_id"]
               for r in idx.stored.select("path", "doc_id").collect()}
    got = _scores(idx, ast.OrdFieldScore("fruit"))
    assert got[by_path["d1"]] == 1.0 and got[by_path["d4"]] == 1.0
    assert got[by_path["d2"]] == 2.0
    assert got[by_path["d0"]] == 3.0
    assert got[by_path["d3"]] == 0.0


def test_reverse_ord_missing_scores_max(idx):
    """end = nDistinct+1 = 4; reverse scores: apple 3, banana 2, pear 1,
    missing 4 (end - 0) — ReverseOrdFieldSource.cs:85 preserved."""
    by_path = {r["path"]: r["doc_id"]
               for r in idx.stored.select("path", "doc_id").collect()}
    got = _scores(idx, ast.OrdFieldScore("fruit", reverse=True))
    assert got[by_path["d3"]] == 4.0
    assert got[by_path["d1"]] == 3.0
    assert got[by_path["d2"]] == 2.0
    assert got[by_path["d0"]] == 1.0


def test_boost_scales(idx):
    got = _scores(idx, ast.OrdFieldScore("fruit", boost=0.5))
    assert set(got.values()) == {0.0, 0.5, 1.0, 1.5}
