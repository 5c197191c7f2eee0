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


# ---- Syns2Index wn_s.pl prolog ingestion (Syns2Index.cs) --------------

WN_FIXTURE = """\
s(100001740,1,'entity',n,1,11).
s(100002056,1,'thing',n,12,0).
s(100002056,2,'entity',n,1,11).
s(100003009,1,'big',a,1,1).
s(100003009,2,'large',a,1,1).
s(100003009,3,'bad',a,13,0).
s(100004000,1,'big',a,2,0).
s(100004000,2,'prominent',a,1,0).
s(100005000,1,'pit bull',n,1,0).
s(100005000,2,'dog',n,1,0).
s(100006000,1,'rock ''n'' roll',n,1,0).
s(100006000,2,'rock',n,1,0).
"""


def test_parse_wn_prolog_basic():
    from lucenenet_spark.analysis.synonyms import parse_wn_prolog
    m = parse_wn_prolog(WN_FIXTURE.splitlines())
    # synonyms = union over synsets, minus self, sorted
    assert m["big"] == ("bad", "large", "prominent")
    assert m["large"] == ("bad", "big")
    assert m["entity"] == ("thing",)
    assert m["thing"] == ("entity",)
    # 'pit bull' has a space -> rejected at parse time (ndecent), so
    # 'dog' has no surviving synonyms and is omitted (n > 0 gate)
    assert "pit bull" not in m and "dog" not in m
    # the reference's Substring/IndexOf scan stops at the FIRST closing
    # quote: 'rock ''n'' roll' truncates to "rock " -> has a space ->
    # rejected; 'rock' then has no synonyms left
    assert "rock" not in m


def test_parse_wn_prolog_rejects_garbage():
    import pytest

    from lucenenet_spark.analysis.synonyms import parse_wn_prolog
    with pytest.raises(ValueError, match="OUCH"):
        parse_wn_prolog(["not_a_synset(1)."])


def test_parsed_map_feeds_expand():
    from lucenenet_spark.analysis.synonyms import expand, parse_wn_prolog
    from lucenenet_spark.plans import ast
    m = parse_wn_prolog(WN_FIXTURE.splitlines())
    q = expand("big", m, boost=0.9)
    terms = [(c.term, c.boost) for c in q.should]
    assert terms == [("big", 1.0), ("bad", 0.9), ("large", 0.9),
                     ("prominent", 0.9)]
    assert isinstance(q, ast.Bool)
