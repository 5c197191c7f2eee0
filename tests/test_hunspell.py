"""Hunspell stemmer semantics (analysis/hunspell.py), exercising the
behaviors the reference pins in
test/contrib/Analyzers/Hunspell/TestHunspellStemmer.cs — simple suffix,
simple prefix, recursive suffix stripping, dictionary-gated stems,
condition checks — over a self-authored mini dictionary in the public
.aff/.dic format."""

from lucenenet_spark.analysis.hunspell import (
    HunspellDictionary, HunspellStemmer, hunspell_analyzer, hunspell_tokens)
from lucenenet_spark.index.segments import build_segmented_index
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher

AFF = """SET UTF-8

PFX X Y 1
PFX X 0 re .

SFX D Y 1
SFX D 0 able .

SFX S Y 1
SFX S 0 s .

SFX G Y 1
SFX G e ing e

SFX P Y 1
SFX P 0 er [^e]
"""

DIC = """6
drink/D
drinkable/S
move/XGP
fiets/S
appel
print/S
"""


def _stemmer():
    return HunspellStemmer(HunspellDictionary(AFF, DIC))


def test_simple_suffix():
    # 'drinkable' is itself a word (flag S) AND strips -able to 'drink'
    assert _stemmer().unique_stems("drinkable") == ["drinkable", "drink"]


def test_simple_prefix():
    # 'remove' is not a word; prefix re- strips to 'move'
    assert _stemmer().unique_stems("remove") == ["move"]


def test_recursive_suffix():
    # drinkables -s-> drinkable (flag S, cross-product) -able-> drink:
    # the recursion REPLACES the intermediate stem
    assert _stemmer().unique_stems("drinkables") == ["drink"]


def test_dictionary_gates_stems():
    # 'printable' strips to 'print', but print lacks flag D -> no stem;
    # unknown words produce nothing
    s = _stemmer()
    assert s.unique_stems("printable") == []
    assert s.unique_stems("xyzzy") == []
    assert s.unique_stems("prints") == ["print"]


def test_strip_and_condition():
    # SFX G: strip 'ing', add back 'e', condition 'e$' on the stripped
    # word: moving -> move
    s = _stemmer()
    assert s.unique_stems("moving") == ["move"]
    # SFX P: condition '[^e]$' rejects 'move' even though move has flag P
    assert s.unique_stems("mover") == []


def test_filter_semantics_and_positions():
    stemmer = _stemmer()
    toks = hunspell_tokens("remove the drinkables quickly", stemmer)
    # 'the' is a stopword (hole at pos 1); unknown 'quickly' unchanged
    assert toks == [("move", 0), ("drink", 2), ("quickly", 3)]
    # dedup=False keeps duplicate stems
    multi = hunspell_tokens("drinkable", stemmer, dedup=False)
    assert multi == [("drinkable", 0), ("drink", 0)]


def test_indexed_via_analyzer_seam(spark):
    docs = spark.createDataFrame(
        [(0, "remove the drinkables"), (1, "prints parked"),
         (2, "drink deep")],
        ["doc_id", "text"])
    idx = build_segmented_index(
        spark, docs, text_col="text", id_col="doc_id",
        analyzer=hunspell_analyzer(HunspellDictionary(AFF, DIC)))
    s = Searcher(idx)
    assert {r.doc_id for r in s.search(ast.Term("drink"), 10).collect()} \
        == {0, 2}
    assert {r.doc_id for r in s.search(ast.Term("print"), 10).collect()} \
        == {1}
    # unknown words pass through unchanged and stay queryable
    assert {r.doc_id for r in s.search(ast.Term("parked"), 10).collect()} \
        == {1}
