"""Deterministic stratified sampling + eval-set contamination
(operators/sampling.py): reproducibility, fraction accuracy, salt
independence, and hand-checkable contamination ratios."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.operators.sampling import (eval_contamination,
                                                stratified_sample)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc {i} " + " ".join(f"w{(i * 7 + j) % 50}"
                                       for j in range(12)),
             "a" if i % 2 == 0 else "b")
            for i in range(2000)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string").cache()


def test_sample_deterministic_and_fractional(docs):
    fr = {"a": 0.5, "b": 0.1}
    s1 = stratified_sample(docs, "source", fr)
    s2 = stratified_sample(docs, "source", fr)
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2  # re-runs select the SAME rows
    by = {r["source"]: r["n"] for r in
          s1.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by["a"] == pytest.approx(500, abs=80)   # 1000 * 0.5
    assert by["b"] == pytest.approx(100, abs=40)   # 1000 * 0.1


def test_sample_salt_and_missing_strata(docs):
    fr = {"a": 0.5}  # stratum b absent -> dropped entirely
    base = stratified_sample(docs, "source", fr)
    assert base.where("source = 'b'").count() == 0
    other = stratified_sample(docs, "source", fr, salt="other")
    a = {r["doc_id"] for r in base.select("doc_id").collect()}
    b = {r["doc_id"] for r in other.select("doc_id").collect()}
    assert a != b  # independent draw under a different salt
    # ... of roughly the same size
    assert len(b) == pytest.approx(len(a), rel=0.4)


def test_contamination_hand_case(spark):
    train = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today"),
         (1, "completely unrelated text with different words here now"),
         (2, "quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "a quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           eval_contamination(train, ev, n=5).collect()}
    assert set(got) == {0, 2}  # doc 1 shares no 5-gram
    for d in got.values():
        assert 0 < d["n_hits"] <= d["n_shingles"]
        assert d["contamination"] == pytest.approx(
            d["n_hits"] / d["n_shingles"], abs=1e-6)
