"""contrib Highlighter + SpellChecker operators: fragment selection,
markup, gram candidate rules, and levenshtein rerank vs a brute-force
python recompute."""

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.operators import highlight, spell


# ---------------------------------------------------------------- highlight
def test_best_fragment_picks_densest_window(spark):
    # 8 filler tokens, then a window with two query-term hits
    text = ("alpha beta gamma delta epsilon zeta eta theta "
            "spark join spark merge one two three four")
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    hits = spark.createDataFrame([(1, 1.5)], ["doc_id", "score"])
    out = highlight.best_fragments(hits, docs, ["spark"],
                                   frag_tokens=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r.frag_idx == 1 and r.frag_score == 2
    assert r.snippet.startswith("<b>spark</b> join <b>spark</b> merge")


def test_tie_prefers_earliest_fragment(spark):
    text = "spark one two three four five six seven spark a b c d e f g"
    docs = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    hits = spark.createDataFrame([(7, 0.5)], ["doc_id", "score"])
    r = highlight.best_fragments(hits, docs, ["spark"],
                                 frag_tokens=8).collect()[0]
    assert r.frag_idx == 0 and r.frag_score == 1


def test_no_match_keeps_fragment_zero(spark):
    docs = spark.createDataFrame([(3, "just plain filler words here")],
                                 ["doc_id", "text"])
    hits = spark.createDataFrame([(3, 0.1)], ["doc_id", "score"])
    r = highlight.best_fragments(hits, docs, ["absent"]).collect()[0]
    assert r.frag_idx == 0 and r.frag_score == 0
    assert "<b>" not in r.snippet


def test_markup_respects_analyzer_transform(spark):
    # stored surface "Spark's" analyzes to token "spark" -> highlighted
    docs = spark.createDataFrame([(9, "Spark's merge wave")],
                                 ["doc_id", "text"])
    hits = spark.createDataFrame([(9, 1.0)], ["doc_id", "score"])
    r = highlight.best_fragments(hits, docs, ["spark"]).collect()[0]
    assert r.snippet == "<b>spark</b> merge wave"


def test_multi_doc_order_is_score_then_docid(spark):
    docs = spark.createDataFrame(
        [(1, "spark alpha"), (2, "spark beta"), (3, "spark gamma")],
        ["doc_id", "text"])
    hits = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 1.0)], ["doc_id", "score"])
    out = highlight.best_fragments(hits, docs, ["spark"]).collect()
    assert [r.doc_id for r in out] == [2, 1, 3]


# ------------------------------------------------------------------- spell
def test_gram_range_matches_reference_rule():
    # SpellChecker.cs:446-470
    assert spell.gram_range(4) == (1, 2)
    assert spell.gram_range(5) == (2, 3)
    assert spell.gram_range(6) == (3, 4)
    assert spell.gram_range(12) == (3, 4)


def test_word_grams_contiguous():
    assert spell.word_grams("ab") == ["a", "ab", "b"]
    gs = spell.word_grams("sprak")          # len 5 -> sizes 2..3
    assert "sp" in gs and "spr" in gs and "rak" in gs
    assert all(2 <= len(g) <= 3 for g in gs)


def _brute(vocab, word, num, min_score=0.5):
    import math

    def lev(a, b):
        p = list(range(len(a) + 1))
        for j, cb in enumerate(b, 1):
            d = [j] + [0] * len(a)
            for i, ca in enumerate(a, 1):
                d[i] = min(d[i - 1] + 1, p[i] + 1,
                           p[i - 1] + (0 if ca == cb else 1))
            p = d
        return p[len(a)]

    grams = spell.word_grams(word)
    out = []
    for t, df in vocab:
        if t == word or not any(g in t for g in grams):
            continue
        s = round(1.0 - lev(word, t) / max(len(word), len(t)), 6)
        if s >= min_score:
            out.append((t, s, df))
    out.sort(key=lambda r: (-r[1], -r[2], r[0]))
    return out[:num]


def test_suggest_matches_bruteforce(spark):
    vocab = [("spark", 40), ("spars", 3), ("sparks", 11), ("prank", 2),
             ("merge", 9), ("shark", 5), ("spray", 5), ("park", 7),
             ("sprat", 7), ("stark", 7)]
    vdf = spark.createDataFrame(vocab, ["term", "df"])
    got = [(r.term, r.score, r.df)
           for r in spell.suggest_similar(vdf, "sprak", num_sug=5).collect()]
    assert got == _brute(vocab, "sprak", 5)
    assert got[0][0] in ("spark", "sprat")  # lev 2 swaps / 1 sub


def test_suggest_excludes_word_itself_and_low_scores(spark):
    vdf = spark.createDataFrame(
        [("unrelated", 99), ("sprakle", 1)], ["term", "df"])
    got = spell.suggest_similar(vdf, "sprak", num_sug=5).collect()
    terms = [r.term for r in got]
    assert "sprak" not in terms
    assert "unrelated" not in terms       # shares no gram / low score
    assert "sprakle" in terms             # lev 2 / len 7 -> 0.714286


def test_suggest_existing_word_and_more_popular(spark):
    """Reference popularity contract (SpellChecker.cs:206-285): a word
    already in the index is its own single answer by default (:217
    returns new String[]{word}); with more_popular=True terms at LEAST
    as frequent as the goal qualify (:285 skips only goalFreq > freq)."""
    vdf = spark.createDataFrame(
        [("sprak", 10), ("sprakle", 1), ("spark", 40), ("sprag", 10)],
        ["term", "df"])
    got0 = spell.suggest_similar(vdf, "sprak", num_sug=5).collect()
    assert [(r.term, r.score, r.df) for r in got0] == [("sprak", 1.0, 10)]
    got = spell.suggest_similar(vdf, "sprak", num_sug=5,
                                more_popular=True).collect()
    # spark df 40 > goal; sprag df 10 == goal KEPT; sprakle 1 < 10 out
    assert [r.term for r in got] == ["sprag", "spark"]


def test_suggest_index_vocab_smoke(spark, sf_dir):
    """End-to-end over the real segmented-index vocabulary."""
    import __spark_entry__ as e
    out = e.queries()["spell_suggest"](spark, sf_dir).collect()
    assert 1 <= len(out) <= 5
    assert all(r.score >= 0.5 for r in out)
    assert all(r.term != "sprak" for r in out)
