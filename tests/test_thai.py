"""ThaiAnalyzer chain (contrib/Analyzers/Th): dictionary word-break over
Thai runs, pass-through latin with StandardFilter, English stop holes,
and the reference-faithful 'PORT ISSUES' behavior when no word breaker
is supplied (ThaiWordFilter.cs:53 throws NotSupportedException)."""

from __future__ import annotations

import pytest

from lucenenet_spark.analysis.intl import (dict_word_break, thai_analyzer)

# toy lexicon: ไก่ (chicken), ขัน (crows), มา (come), มาก (much), น้ำ (water)
LEX = ["ไก่", "ขัน", "มา", "มาก", "น้ำ"]


def test_default_mirrors_port_issues_throw():
    an = thai_analyzer()
    assert an("hello merge world") == [("hello", 0), ("merge", 1),
                                       ("world", 2)]
    with pytest.raises(NotImplementedError):
        an("hello ไก่ขัน")


def test_dict_break_segments_runs():
    an = thai_analyzer(word_break=dict_word_break(LEX))
    assert an("ไก่ขัน") == [("ไก่", 0), ("ขัน", 1)]


def test_greedy_longest_match():
    brk = dict_word_break(LEX)
    assert brk("มาก") == ["มาก"]          # longest wins over มา + ก
    assert brk("มามาก") == ["มา", "มาก"]


def test_unknown_chars_degrade_to_singles():
    brk = dict_word_break(LEX)
    assert brk("ฟไก่") == ["ฟ", "ไก่"]


def test_mixed_text_positions_and_stop_holes():
    an = thai_analyzer(word_break=dict_word_break(LEX))
    # "the" is stopped (leaves a hole); Thai run splits into two words;
    # latin keeps flowing with consecutive positions after the hole
    assert an("the ไก่ขัน crows") == [("ไก่", 1), ("ขัน", 2), ("crows", 3)]


def test_no_lowercase_filter_in_chain():
    """ThaiAnalyzer has no LowerCaseFilter (ThaiAnalyzer.cs:36-44), so
    'The' survives the lowercase stop set while 'the' does not."""
    an = thai_analyzer(word_break=dict_word_break(LEX))
    assert an("The the") == [("The", 0)]


def test_end_to_end_index_and_search(spark):
    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.plans import ast
    from lucenenet_spark.plans.lowering import Searcher
    from lucenenet_spark.sources.corpus import with_doc_ids

    df = spark.createDataFrame(
        [("r", "a", "ไก่ขัน merge"), ("r", "b", "น้ำมาก"),
         ("r", "c", "merge มา")],
        "repo string, path string, content string")
    idx = build_segmented_index(
        spark, with_doc_ids(df), text_col="content",
        analyzer=thai_analyzer(word_break=dict_word_break(LEX)))
    s = Searcher(idx)
    hits = {r["doc_id"] for r in
            s.search(ast.Term("ไก่", field="content"), 10).collect()}
    stored = {r["path"]: r["doc_id"]
              for r in idx.stored.select("path", "doc_id").collect()}
    assert hits == {stored["a"]}
    hits2 = {r["doc_id"] for r in
             s.search(ast.Term("merge", field="content"), 10).collect()}
    assert hits2 == {stored["a"], stored["c"]}
