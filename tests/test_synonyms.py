"""contrib WordNet analogues (analysis/synonyms.py): SynExpand's global
dedup walk, index-time position stacking, and end-to-end phrase behavior
through injected positions."""

from lucenenet_spark.analysis.synonyms import (
    expand, lookup, synonym_analyzer, synonym_tokens)
from lucenenet_spark.index.segments import build_segmented_index
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher

SYNS = {"big": ("large", "grown"), "dog": ("hound", "big")}


def test_lookup():
    assert lookup("big", SYNS) == ("large", "grown")
    assert lookup("cat", SYNS) == ()


def test_expand_global_dedup_and_order():
    # SynExpand.cs: query words first (already-listed), then synonyms per
    # word at boost; 'big' as a synonym of 'dog' is deduped against the
    # query word; repeated query words dedup too
    q = expand("big dog big", SYNS, boost=0.9)
    assert isinstance(q, ast.Bool)
    got = [(c.term, c.boost) for c in q.should]
    assert got == [("big", 1.0), ("dog", 1.0), ("large", 0.9),
                   ("grown", 0.9), ("hound", 0.9)]


def test_expand_single_word_collapses():
    # one clause -> 1-clause boolean rewrite collapses to the Term
    q = expand("cat", SYNS)
    assert q == ast.Term("cat")


def test_synonym_tokens_stack_at_source_position():
    toks = synonym_tokens("the big dog", SYNS)  # 'the' is a stopword
    assert ("big", 1) in toks and ("dog", 2) in toks
    assert ("large", 1) in toks and ("grown", 1) in toks
    assert ("hound", 2) in toks and ("big", 2) in toks


def test_injected_synonym_queryable_and_phrase_aligned(spark):
    docs = spark.createDataFrame(
        [(0, "big dog runs"), (1, "small cat sleeps"), (2, "hound dog")],
        ["doc_id", "text"])
    idx = build_segmented_index(
        spark, docs, text_col="text", id_col="doc_id",
        analyzer=synonym_analyzer(SYNS))
    s = Searcher(idx)
    hits = {r.doc_id for r in s.search(ast.Term("hound"), 10).collect()}
    assert hits == {0, 2}  # doc0 via injection on 'dog', doc2 literal
    # injected 'large'@1 aligns with literal 'dog'@2: phrase matches doc0
    ph = {r.doc_id for r in s.search(ast.Phrase(("large", "dog")), 10).collect()}
    assert ph == {0}
