"""contrib Queries completions (operators/fuzzylike.py)."""

import os

import pytest

from lucenenet_spark.operators.fuzzylike import (
    form_similar_query, fuzzy_like_this_query, terms_filter)
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher


def test_form_similar_query_dedup_and_stops():
    q = form_similar_query("spark merge the spark fast", stop={"fast"})
    assert isinstance(q, ast.Bool)
    # 'the' dropped by the analyzer, 'fast' by the extra stop set,
    # duplicate 'spark' deduped, first-occurrence order kept
    assert [c.term for c in q.should] == ["spark", "merge"]


def test_terms_filter_sorted_unique():
    f = terms_filter(["zeta", "alpha", "zeta"])
    assert [c.term for c in f.should] == ["alpha", "zeta"]


@pytest.fixture(scope="module")
def seg_searcher(spark, sf_dir):
    from lucenenet_spark.index.segments import build_segmented_index
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return Searcher(build_segmented_index(spark, docs, text_col="text",
                                          id_col="doc_id"))


def test_fuzzy_like_this_structure(seg_searcher):
    q = fuzzy_like_this_query(seg_searcher.index, "merge scan",
                              min_similarity=0.5, prefix_length=1,
                              max_num_terms=8)
    assert isinstance(q, ast.Bool)
    flat = []
    for c in q.should:
        flat.extend(c.should if isinstance(c, ast.Bool) else [c])
    assert 0 < len(flat) <= 8
    # the exact source terms qualify as their own best variants (sim=1)
    terms = {t.term for t in flat}
    assert "merge" in terms and "scan" in terms
    # boosts carry sim^2 * idf: the exact term's boost is its idf
    boosts = {t.term: t.boost for t in flat}
    assert boosts["merge"] > 0
    # hits score and rank deterministically
    hits = seg_searcher.search(q, 10).collect()
    assert len(hits) == 10


def test_fuzzy_like_this_unknown_text_matches_nothing(seg_searcher):
    q = fuzzy_like_this_query(seg_searcher.index, "zzzzqqqq",
                              min_similarity=0.9)
    assert seg_searcher.search(q, 10).count() == 0
