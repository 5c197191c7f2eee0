"""contrib Analyzers periphery: Compound decompounding, Reverse +
leading-wildcard acceleration, PatternAnalyzer, PositionFilter,
QueryAutoStopWordAnalyzer (analysis/compound.py, analysis/misc.py)."""

from lucenenet_spark.analysis.compound import (
    compound_tokens, decompose)
from lucenenet_spark.analysis.misc import (
    auto_stop_analyzer, auto_stopwords, leading_wildcard_query,
    pattern_tokens, position_filter_tokens, reverse_analyzer,
    reverse_tokens)
from lucenenet_spark.index.segments import build_segmented_index
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher

DIC = {"rind", "fleisch", "ueber", "wachung", "fleis"}


def test_decompose_all_matches_and_longest():
    parts = decompose("rindfleisch", DIC)
    assert "rind" in parts and "fleisch" in parts and "fleis" in parts
    longest = decompose("rindfleisch", DIC, only_longest_match=True)
    assert "fleisch" in longest and "fleis" not in longest
    # below minWordSize: untouched
    assert decompose("rind", DIC) == []


def test_compound_tokens_keep_original_and_position():
    toks = compound_tokens("die rindfleisch probe", DIC)
    assert ("rindfleisch", 1) in toks
    assert ("rind", 1) in toks and ("fleisch", 1) in toks


def test_reverse_and_leading_wildcard(spark):
    assert reverse_tokens("spark merge")[0] == ("kraps", 0)
    docs = spark.createDataFrame(
        [(0, "prefix and suffix"), (1, "postfix capacitor"),
         (2, "plain words")],
        ["doc_id", "text"])
    fwd = Searcher(build_segmented_index(
        spark, docs, text_col="text", id_col="doc_id"))
    rev = Searcher(build_segmented_index(
        spark, docs, text_col="text", id_col="doc_id",
        field_name="text_rev", analyzer=reverse_analyzer()))
    # *fix (suffix wildcard) on the forward index == prefix on reversed
    direct = {r.doc_id for r in fwd.search(ast.Wildcard("*fix"), 10).collect()}
    q = leading_wildcard_query("*fix", "text_rev")
    assert isinstance(q, ast.Prefix) and q.prefix == "xif"
    accel = {r.doc_id for r in rev.search(q, 10).collect()}
    assert direct == accel == {0, 1}


def test_pattern_tokens_split_semantics():
    toks = pattern_tokens("a-b;c the,d", pattern=r"[-;,\s]+")
    # 'a' and 'the' are stopwords -> holes at 0 and 3
    assert toks == [("b", 1), ("c", 2), ("d", 4)]


def test_position_filter_stacks():
    toks = [("a", 0), ("b", 1), ("c", 2)]
    assert position_filter_tokens(toks) == [("a", 0), ("b", 0), ("c", 0)]
    assert position_filter_tokens(toks, 1) == [("a", 0), ("b", 1), ("c", 2)]


def test_auto_stopwords_derivation(spark):
    docs = spark.createDataFrame(
        [(i, ("common " if i % 2 == 0 else "common rare ") + f"w{i}")
         for i in range(10)],
        ["doc_id", "text"])
    idx = build_segmented_index(spark, docs, text_col="text",
                                id_col="doc_id")
    stops = auto_stopwords(idx, "text", 0.6)  # df > 6: only 'common'(10)
    assert stops == {"common"}
    an = auto_stop_analyzer(stops)
    assert an("common rare w1") == [("rare", 1), ("w1", 2)]  # hole at 0
