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


# ---- HyphenationCompoundWordTokenFilter (round 5) ---------------------

def test_hyphenation_points_and_framing():
    from lucenenet_spark.analysis.compound import HyphenationPatterns
    hy = HyphenationPatterns(["soft1ware", "ware1up", "up1date"])
    # synthetic 0/len endpoints exactly like Hyphenation.cs
    assert hy.hyphenate("softwareupdate") == [0, 4, 8, 10, 14]
    # remain/push bounds: a point at index 0 or len is never emitted
    hy2 = HyphenationPatterns(["1soft", "date1"])
    assert hy2.hyphenate("softwaredate") is None
    # word-boundary patterns match against the '.' frame
    hy3 = HyphenationPatterns([".so2f3t"])
    assert hy3.hyphenate("software") == [0, 3, 8]


def test_hyphenation_normalization_quirks():
    from lucenenet_spark.analysis.compound import HyphenationPatterns
    hy = HyphenationPatterns(["soft1ware"])
    # uppercase normalized through the classes map
    assert hy.hyphenate("SoftWare") == [0, 4, 8]
    # leading non-letters are skipped, points shifted by the skip
    assert hy.hyphenate("--software") == [0, 6, 8]
    # trailing non-letters dropped; interior non-letter -> None
    assert hy.hyphenate("software--") == [0, 4, 8]
    assert hy.hyphenate("soft-ware") is None
    # too short for remain+push
    assert hy.hyphenate("a") is None


def test_hyphenation_exceptions_list():
    from lucenenet_spark.analysis.compound import HyphenationPatterns
    hy = HyphenationPatterns(["soft1ware"],
                             exceptions=["soft-wareup-date"])
    # the exception overrides the pattern machinery entirely
    assert hy.hyphenate("softwareupdate") == [0, 4, 10, 14]
    # exception points obey remain <= j < len - push (strict <)
    hy2 = HyphenationPatterns([], exceptions=["softwar-e"])
    assert hy2.hyphenate("software") is None


def test_hyphenation_decompose_matches_reference_loop():
    from lucenenet_spark.analysis.compound import (
        HyphenationPatterns, hyphenation_decompose)
    hy = HyphenationPatterns(["soft1ware", "ware1up", "up1date"])
    dic = {"soft", "software", "ware", "update"}
    assert hyphenation_decompose("softwareupdate", hy, dic) == [
        "soft", "software", "ware", "update"]
    # onlyLongestMatch keeps ONE longest per start point
    assert hyphenation_decompose("softwareupdate", hy, dic,
                                 only_longest_match=True) == [
        "software", "ware", "update"]
    # min_word_size gate passes short tokens through undecomposed
    assert hyphenation_decompose("soft", hy, dic) == []
    # maxSubwordSize break: 'software' (8) skipped when max is 7
    assert hyphenation_decompose("softwareupdate", hy, dic,
                                 max_subword_size=7) == [
        "soft", "ware", "update"]
    # genitive-s quirk: part one char shorter tried WITHOUT re-checking
    # minSubwordSize
    hy2 = HyphenationPatterns(["work1s", "s1shop"])
    dic2 = {"work", "shop"}
    # (0,4)='work', (0,5)='works'->shorter 'work' AGAIN (the reference
    # emits the duplicate), (5,9)='shop'
    assert hyphenation_decompose("worksshop", hy2, dic2) == [
        "work", "work", "shop"]


def test_hyphenation_analyzer_stacks_parts():
    from lucenenet_spark.analysis.compound import (
        HyphenationPatterns, hyphenation_compound_analyzer)
    hy = HyphenationPatterns(["soft1ware"])
    an = hyphenation_compound_analyzer(hy, {"soft", "ware"})
    toks = an("the softwareplan runs")
    # stop filter holes preserved; parts at the compound's position.
    # only 'soft' decomposes: the single hyphen point is at 4, so no
    # part starts at 'ware' (no point at 8)
    assert ("softwareplan", 1) in toks
    assert ("soft", 1) in toks and ("ware", 1) not in toks
