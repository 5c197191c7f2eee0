"""Analyzer parity: pure-Python spec == Spark JVM exprs == Arrow pandas_udf.

Mirrors the reference analyzer golden tests
(test/Lucene.Net.Test/Analysis/TestStandardAnalyzer.cs style)."""

import pandas as pd
from pyspark.sql import functions as F

from lucenenet_spark.analysis import tokenizers as tk
from lucenenet_spark.analysis import exprs
from lucenenet_spark.sources.corpus import gen_corpus_rows


def test_stop_set_is_exact_reference_list():
    # src/Lucene.Net/Analysis/StopAnalyzer.cs:134
    assert len(tk.ENGLISH_STOP_WORDS) == 33
    assert "the" in tk.ENGLISH_STOP_WORDS
    assert "into" in tk.ENGLISH_STOP_WORDS
    assert "search" not in tk.ENGLISH_STOP_WORDS


def test_standard_tokenizer_positions_have_holes():
    # "words of the world": stopwords `of`/`the` occupy positions 1,2
    toks = tk.tokenize_standard("words of the world")
    assert toks == [("words", 0), ("world", 3)]


def test_standard_tokenizer_golden():
    assert tk.tokenize_standard("The Quick-Brown FOX2; jumps") == [
        ("quick", 1), ("brown", 2), ("fox2", 3), ("jumps", 4),
    ]
    assert tk.tokenize_standard("") == []
    assert tk.tokenize_standard(None) == []


def test_code_tokenizer_splits_identifiers():
    toks = [t for t, _ in tk.tokenize_code("getFooBar snake_case_name MAX_VALUE x2")]
    assert toks == ["get", "foo", "bar", "snake", "case", "name",
                    "max", "value", "x2"]


def test_jvm_exprs_match_python_spec(spark):
    rows = gen_corpus_rows(100, seed=7)
    texts = [r[4] for r in rows] + ["", "THE the THE", "a b c", "x" * 300]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = (
        df.select("i", F.posexplode(exprs.raw_tokens(F.col("text"))).alias("pos", "term"))
        .where(exprs.is_indexed_token(F.col("term")))
        .orderBy("i", "pos")
        .collect()
    )
    spark_toks = {}
    for r in got:
        spark_toks.setdefault(r["i"], []).append((r["term"], r["pos"]))
    for i, t in enumerate(texts):
        assert spark_toks.get(i, []) == tk.tokenize_standard(t), f"mismatch on row {i}"


def test_pandas_udf_matches_python_spec(spark):
    from lucenenet_spark.analysis.udfs import analyze_per_lang

    rows = gen_corpus_rows(60, seed=11)
    df = spark.createDataFrame(
        [(i, r[3], r[4]) for i, r in enumerate(rows)], "i int, lang string, text string"
    )
    got = df.select("i", analyze_per_lang(F.col("text"), F.col("lang")).alias("tp")).collect()
    for r in got:
        expected = tk.tokenize(rows[r["i"]][4], rows[r["i"]][3])
        assert [(x["term"], x["pos"]) for x in r["tp"]] == expected
