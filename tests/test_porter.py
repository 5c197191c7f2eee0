"""Porter stemmer (PorterStemFilter analogue): worked examples from
Porter (1980) run through the FULL algorithm, plus the analyzer-variant
integration (stemmed index matches stemmed query)."""

import pytest

from lucenenet_spark.analysis.porter import porter_stem, tokenize_porter
from lucenenet_spark.index.segments import build_segmented_index
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher

VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    # step 3 yields electric, step 4 (m>1) strips the ic — full pipeline
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_porter_vectors():
    bad = {w: (porter_stem(w), want) for w, want in VECTORS.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_tokenize_porter_chain():
    # standard chain first (lowercase, stopword holes), then stemming
    assert tokenize_porter("The ponies are motoring") == [
        ("poni", 1), ("motor", 3)]


def test_stemmed_index_conflates_inflections(spark):
    docs = spark.createDataFrame(
        [(0, "the ponies were motoring fast"),
         (1, "a pony motors daily"),
         (2, "unrelated words entirely")],
        "doc_id long, text string")
    idx = build_segmented_index(spark, docs, text_col="text",
                                field_name="text", analyzer=tokenize_porter)
    s = Searcher(idx)
    # query analyzed with the same stemmer: 'motoring' matches 'motors'
    q_terms = [t for t, _ in tokenize_porter("motoring")]
    hits = {r["doc_id"] for r in s.search(ast.Term(q_terms[0]), 10).collect()}
    assert hits == {0, 1}
    hits = {r["doc_id"] for r in
            s.search(ast.Term(porter_stem("ponies")), 10).collect()}
    assert hits == {0, 1}
