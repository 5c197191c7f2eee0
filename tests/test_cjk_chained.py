"""CJK bigram analyzer (analysis/cjk.py) and ChainedFilter algebra
(plans/lowering._chained_filter_ids)."""

import pytest

from lucenenet_spark.analysis.cjk import cjk_analyzer, cjk_tokens
from lucenenet_spark.index.segments import build_segmented_index
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher


def test_cjk_bigrams_and_latin_runs():
    toks = cjk_tokens("Spark分散処理 engine")
    # latin run, then overlapping bigrams over the 4-char CJK run
    assert toks == [
        ("spark", 0),
        ("分散", 1), ("散処", 2), ("処理", 3),
        ("engine", 4),
    ]
    # isolated CJK char emits itself; stopword latin leaves a hole
    assert cjk_tokens("the 中 x") == [("中", 1), ("x", 2)]


def test_cjk_phrase_via_consecutive_bigrams(spark):
    docs = spark.createDataFrame(
        [(0, "分散処理 spark"), (1, "処理 only"),
         (2, "plain latin")],
        ["doc_id", "text"])
    s = Searcher(build_segmented_index(
        spark, docs, text_col="text", id_col="doc_id",
        analyzer=cjk_analyzer()))
    hits = {r.doc_id for r in
            s.search(ast.Term("処理"), 10).collect()}
    assert hits == {0, 1}
    # consecutive bigrams make a CJK phrase work at slop 0
    ph = {r.doc_id for r in s.search(
        ast.Phrase(("分散", "散処")), 10).collect()}
    assert ph == {0}


def test_chinese_single_char_tokens():
    from lucenenet_spark.analysis.cjk import chinese_tokens
    # each ideograph its own token; latin run lowered; stopword 'the'
    # dropped; single-char latin and digit-first tokens dropped
    assert chinese_tokens("The 中文 Spark x 42abc") == [
        ("中", 0), ("文", 1), ("spark", 2),
    ]
    # mixed run split at the Lo boundary (ChineseTokenizer.cs:155-163)
    assert chinese_tokens("ab中cd") == [("ab", 0), ("中", 1), ("cd", 2)]


def test_chinese_no_position_holes():
    from lucenenet_spark.analysis.cjk import chinese_tokens
    # ChineseFilter skips tokens WITHOUT advancing positions: survivors
    # are consecutive (deviation-free vs the reference, which has no
    # posIncrement handling in this filter)
    toks = chinese_tokens("the 9x 中 of 文")
    assert toks == [("中", 0), ("文", 1)]


@pytest.fixture()
def cf_searcher(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gamma"), (2, "beta gamma"),
         (3, "delta only")],
        ["doc_id", "text"])
    return Searcher(build_segmented_index(
        spark, docs, text_col="text", id_col="doc_id"))


def _ids(searcher, chain):
    return {r.doc_id for r in searcher.match_frame(chain).collect()}


def test_chained_filter_ops(cf_searcher):
    a, b = ast.Term("alpha"), ast.Term("beta")
    assert _ids(cf_searcher, ast.ChainedFilter((a, b), "OR")) == {0, 1, 2}
    assert _ids(cf_searcher, ast.ChainedFilter((a, b), "AND")) == {0}
    assert _ids(cf_searcher, ast.ChainedFilter((a, b), "XOR")) == {1, 2}
    # ANDNOT seeds with the COMPLEMENT of the first set (bitset flip):
    # universe - alpha = {2,3}, then minus beta = {3}
    assert _ids(cf_searcher, ast.ChainedFilter((a, b), "ANDNOT")) == {3}


def test_chained_filter_per_step_ops_and_validation(cf_searcher):
    a, b, g = ast.Term("alpha"), ast.Term("beta"), ast.Term("gamma")
    # seed OR -> alpha∪beta = {0,1,2}; AND gamma({1,2}) -> {1,2}
    chain = ast.ChainedFilter((a, b, g), ("OR", "OR", "AND"))
    assert _ids(cf_searcher, chain) == {1, 2}
    with pytest.raises(ValueError):
        ast.ChainedFilter((a, b), ("OR",)).resolved_ops()
    with pytest.raises(ValueError):
        ast.ChainedFilter((a,), "NAND").resolved_ops()
