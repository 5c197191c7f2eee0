"""Term vectors WITH_POSITIONS_OFFSETS (index/vectors.py,
TermVectorsWriter.cs / Field.cs:100) + FastVectorHighlighter
(operators/fvh.py, src/contrib/Lucene.Net.Contrib.FastVectorHighlighter/).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.analysis.tokenizers import (
    _std_transform,
    tokenize_standard,
    tokenize_standard_offsets,
)
from lucenenet_spark.index.vectors import term_vectors_with_offsets
from lucenenet_spark.operators import fvh, highlight
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher

DOCS = [
    "Spark merges the segment postings while the table scans keep running",
    "The spark job re-runs a merge wave over the spark segment table",
    "No relevant words at the start. But spark appears late, after "
    "sixteen or more filler tokens pad the first fragment window out; "
    "spark spark spark cluster together in the second window here",
    "O'Reilly's guide to the U.S.A. spark deployment at AT&T scale",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)],
        "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def vectors(corpus):
    return term_vectors_with_offsets(corpus, text_col="text").cache()


def test_offsets_tokenizer_agrees_with_standard():
    for t in DOCS:
        plain = tokenize_standard(t)
        with_off = [(term, pos) for term, pos, _, _ in
                    tokenize_standard_offsets(t)]
        assert plain == with_off
        for term, _, s, e in tokenize_standard_offsets(t):
            assert _std_transform(t[s:e].lower()) == term


def test_vector_positions_match_postings(spark, corpus, vectors):
    from lucenenet_spark.index.segments import build_segmented_index

    idx = build_segmented_index(spark, corpus, text_col="text",
                                id_col="doc_id", field_name="text")
    post = {(r["doc_id"], r["term"]): list(r["positions"])
            for r in idx.postings.collect()}
    vec = {(r["doc_id"], r["term"]): list(r["positions"])
           for r in vectors.collect()}
    assert vec == post
    # offsets really slice the stored surface form
    for r in vectors.collect():
        text = DOCS[r["doc_id"]]
        for s, e in zip(r["starts"], r["ends"]):
            assert _std_transform(text[s:e].lower()) == r["term"]
        assert list(r["positions"]) == sorted(r["positions"])
        assert r["freq"] == len(r["positions"])


def test_fvh_selection_parity_with_token_highlighter(spark, corpus, vectors):
    """FVH must pick the IDENTICAL (frag_idx, frag_score) as the
    re-tokenizing Highlighter — same window semantics, different
    renderer."""
    from lucenenet_spark.index.segments import build_segmented_index

    idx = build_segmented_index(spark, corpus, text_col="text",
                                id_col="doc_id", field_name="text")
    hits = Searcher(idx).search(ast.Term("spark"), 10)
    a = {r["doc_id"]: (r["frag_idx"], r["frag_score"]) for r in
         highlight.best_fragments(hits, corpus, ["spark"]).collect()}
    b = {r["doc_id"]: (r["frag_idx"], r["frag_score"]) for r in
         fvh.best_fragments_fv(hits, vectors, corpus, ["spark"]).collect()}
    assert a == b and len(b) >= 3
    # doc 2's best window is the SECOND fragment (3 sparks cluster there)
    assert b[2][0] == 1 and b[2][1] == 3


def test_fvh_snippet_is_a_stored_slice_with_markup(spark, corpus, vectors):
    from lucenenet_spark.index.segments import build_segmented_index

    idx = build_segmented_index(spark, corpus, text_col="text",
                                id_col="doc_id", field_name="text")
    hits = Searcher(idx).search(ast.Term("spark"), 10)
    rows = fvh.best_fragments_fv(hits, vectors, corpus, ["spark"]).collect()
    for r in rows:
        text = DOCS[r["doc_id"]]
        plain = r["snippet"].replace("<b>", "").replace("</b>", "")
        # rendering slices the ORIGINAL text: casing/punctuation intact
        assert plain in text
        assert r["snippet"].count("<b>") == r["frag_score"]
        inner = [w for w in r["snippet"].split("<b>")[1:]]
        for seg in inner:
            surface = seg.split("</b>")[0]
            assert _std_transform(surface.lower()) == "spark"
    # doc 0: "Spark" keeps its original capital S in the snippet
    r0 = next(r for r in rows if r["doc_id"] == 0)
    assert "<b>Spark</b>" in r0["snippet"]
