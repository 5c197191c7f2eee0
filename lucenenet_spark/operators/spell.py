"""SpellChecker: n-gram candidate generation + edit-distance rerank.

Re-creates contrib SpellChecker (reference:
src/contrib/SpellChecker/Spell/SpellChecker.cs:206-310 SuggestSimilar,
:446-470 GetMin/GetMax gram sizes, LevenshteinDistance.cs:38-116 score
= 1 - lev/max(|a|,|b|)) Spark-first over the index vocabulary:

  * The reference maintains a separate spell index: every dictionary
    word is decomposed into contiguous character n-grams (sizes from the
    word-length rule: len>5 -> 3..4, len==5 -> 2..3, else 1..2) and a
    BooleanQuery ORs the query word's grams to pull candidates, which
    are then RERANKED by string distance and cut to numSug.
  * Set-oriented equivalent: the candidate rule "shares >=1 contiguous
    n-gram with the query word" is exactly "some query gram is a
    substring of the dictionary term", so candidates come from ONE
    narrow scan of the vocabulary with a JVM-side gram filter — the
    vocabulary is millions of rows even at 100 TB corpus scale (it is
    the term dictionary, not the corpus), so a full scan-filter is the
    cheap path; no gram inverted table is needed.
  * DEVIATION (documented): the reference considers only the top
    10*numSug gram-query hits before reranking (SpellChecker.cs:258
    maxHits); this implementation reranks ALL gram-sharing candidates —
    a superset, so no true suggestion is ever cut by the TF-IDF-ordered
    pre-pass.  The DuckDB oracle mirrors THIS spec exactly.

Ordering: score DESC (SuggestWordQueue's primary key), then df DESC
(its frequency tie-break), then term ASC (determinism), limit num_sug.
Suggestions below min_score (reference accuracy default 0.5,
SpellChecker.cs:92) and the word itself are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gram_range", "word_grams", "suggest_similar"]


def gram_range(length: int) -> tuple[int, int]:
    """SpellChecker.GetMin/GetMax (SpellChecker.cs:446-470)."""
    if length > 5:
        return 3, 4
    if length == 5:
        return 2, 3
    return 1, 2


def word_grams(word: str) -> list[str]:
    """All contiguous n-grams of the query word for its length's gram
    sizes (FormGrams, SpellChecker.cs:482-491), deduplicated, sorted for
    plan determinism."""
    lo, hi = gram_range(len(word))
    grams = {word[i:i + ng]
             for ng in range(lo, hi + 1)
             for i in range(len(word) - ng + 1)}
    return sorted(grams)


def suggest_similar(vocab: DataFrame, word: str, num_sug: int = 5,
                    min_score: float = 0.5,
                    term_col: str = "term", df_col: str = "df",
                    more_popular: bool = False) -> DataFrame:
    """SuggestSimilar over an index vocabulary frame (term, df).

    Returns (term, score, df): score = 1 - levenshtein/max(len) rounded
    to 6 decimals (rounded BEFORE the accuracy cut and the ordering so
    the DuckDB oracle agrees bit-for-bit).

    more_popular mirrors the reference's popularity mode
    (SpellChecker.cs:206-285): the searched word's own df is the goal
    frequency — a suggestion is skipped only when ``goalFreq >
    sugWord.freq`` (:285), so EQUAL-popularity suggestions survive
    (df >= goal).  Without it, a word already present in the index is
    its own answer: the reference early-returns ``new String[]{word}``
    (:217), re-created here as the single row (word, 1.0, goal).

    The goal frequency stays IN the plan: a 1-row aggregate broadcast-
    crossed into the candidate frame — no separate driver action, so
    the whole suggestion is one Spark job."""
    grams = word_grams(word)
    term = F.col(term_col)
    shares_gram = None
    for g in grams:
        c = term.contains(g)
        shares_gram = c if shares_gram is None else (shares_gram | c)
    score = F.round(
        F.lit(1.0) - F.levenshtein(F.lit(word), term)
        / F.greatest(F.length(term), F.lit(len(word))).cast("double"),
        6,
    )
    goal_df = (vocab.where(term == word)
               .agg(F.coalesce(F.max(F.col(df_col)), F.lit(0))
                    .cast("long").alias("_goal")))
    cand = (vocab
            .where(shares_gram & (term != word))
            .select(term.alias("term"), score.alias("score"),
                    F.col(df_col).cast("long").alias("df"))
            .where(F.col("score") >= min_score)
            .crossJoin(F.broadcast(goal_df)))
    if more_popular:
        # goalFreq > freq is skipped (cs:285) -> keep df >= goal
        out = cand.where(F.col("df") >= F.col("_goal")).drop("_goal")
    else:
        # word exists -> the word itself is the whole answer (cs:217);
        # the two branches are mutually exclusive on _goal
        self_row = (goal_df.where(F.col("_goal") > 0)
                    .select(F.lit(word).alias("term"),
                            F.lit(1.0).alias("score"),
                            F.col("_goal").alias("df")))
        out = (cand.where(F.col("_goal") == 0).drop("_goal")
               .unionByName(self_row))
    return (out.orderBy(F.desc("score"), F.desc("df"), "term")
            .limit(num_sug))
