"""Contrib Shingle / NGram / EdgeNGram analyzer semantics
(src/contrib/Analyzers/Shingle/ShingleFilter.cs, NGram/NGramTokenizer.cs,
NGram/EdgeNGramTokenizer.cs) and their `analyzer=` integration with the
segmented index builder."""

import pytest

from lucenenet_spark.analysis.shingle import (
    edge_ngram_tokens,
    ngram_tokens,
    shingle_analyzer,
    shingle_tokens,
)


# ----------------------------------------------------------- shingles

def test_shingle_plain_bigrams():
    # no holes: unigram + bigram at every head position
    assert shingle_tokens("fast key order") == [
        ("fast", 0), ("fast key", 0),
        ("key", 1), ("key order", 1),
        ("order", 2),
    ]


def test_shingle_filler_at_stop_hole():
    # "the" is stopped at pos 0 -> FILLER_TOKEN occupies the hole and
    # appears both as a unigram and inside the shingle
    # (ShingleFilter.cs:259-274)
    assert shingle_tokens("the fast key") == [
        ("_", 0), ("_ fast", 0),
        ("fast", 1), ("fast key", 1),
        ("key", 2),
    ]


def test_shingle_interior_hole():
    assert shingle_tokens("fast the key") == [
        ("fast", 0), ("fast _", 0),
        ("_", 1), ("_ key", 1),
        ("key", 2),
    ]


def test_shingle_trailing_holes_vanish():
    # end-of-stream drops pending holes: no shingle extends past the last
    # surviving token (ShingleFilter.cs:333-337)
    assert shingle_tokens("fast key the") == [
        ("fast", 0), ("fast key", 0),
        ("key", 1),
    ]


def test_shingle_trigrams_no_unigrams():
    out = shingle_tokens("fast key order sort", max_shingle=3,
                         output_unigrams=False)
    assert out == [
        ("fast key", 0), ("fast key order", 0),
        ("key order", 1), ("key order sort", 1),
        ("order sort", 2),
        # pos 3 head 'sort' emits nothing: no following token
    ]


def test_shingle_empty_and_all_stop():
    assert shingle_tokens(None) == []
    assert shingle_tokens("") == []
    assert shingle_tokens("the a an") == []  # all stopped -> empty stream


def test_shingle_max_shingle_validation():
    with pytest.raises(ValueError):
        shingle_tokens("x", max_shingle=1)  # ShingleFilter.cs:142


# ----------------------------------------------------------- ngrams

def test_ngram_all_sizes_in_order():
    # all grams of size 1 first, then size 2; sequential positions
    # (NGramTokenizer.cs:96-118)
    assert ngram_tokens("abc", 1, 2) == [
        ("a", 0), ("b", 1), ("c", 2), ("ab", 3), ("bc", 4),
    ]


def test_ngram_no_lowercase_no_filter():
    assert ngram_tokens("Ab", 1, 1) == [("A", 0), ("b", 1)]


def test_ngram_short_text():
    assert ngram_tokens("a", 2, 3) == []
    assert ngram_tokens("", 1, 2) == []
    assert ngram_tokens(None, 1, 2) == []


def test_ngram_validation():
    with pytest.raises(ValueError):
        ngram_tokens("abc", 0, 2)
    with pytest.raises(ValueError):
        ngram_tokens("abc", 3, 2)


def test_edge_ngram_front_back():
    assert edge_ngram_tokens("abcd", 2, 3) == [("ab", 0), ("abc", 1)]
    assert edge_ngram_tokens("abcd", 2, 3, side="back") == [
        ("cd", 0), ("bcd", 1)]
    # sizes past the text length drop
    assert edge_ngram_tokens("ab", 1, 5) == [("a", 0), ("ab", 1)]
    with pytest.raises(ValueError):
        edge_ngram_tokens("ab", 1, 2, side="middle")


# ------------------------------------------- index integration (analyzer=)

def test_shingle_index_phrase_as_term(spark):
    """Bigrams are ordinary index terms: a shingled index answers a
    two-word 'phrase' with a plain TermQuery, and position sharing keeps
    head unigrams searchable too."""
    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.plans import ast
    from lucenenet_spark.plans.lowering import Searcher

    df = spark.createDataFrame(
        [(0, "fast key order"), (1, "key the order"), (2, "order fast key")],
        ["doc_id", "text"],
    )
    idx = build_segmented_index(spark, df, text_col="text", id_col="doc_id",
                                field_name="text",
                                analyzer=shingle_analyzer(max_shingle=2))
    s = Searcher(idx)
    hits = {r.doc_id for r in s.search(ast.Term("fast key"), 10).collect()}
    assert hits == {0, 2}
    # unigram still present at the head position
    hits1 = {r.doc_id for r in s.search(ast.Term("order"), 10).collect()}
    assert hits1 == {0, 1, 2}
    # filler bigram from the stop hole in doc 1
    hits2 = {r.doc_id for r in s.search(ast.Term("key _"), 10).collect()}
    assert hits2 == {1}
