"""Sequence packing + deterministic splits (operators/packing.py)."""

import pytest

from lucenenet_spark.operators.packing import sequence_pack, split_assign


def test_pack_boundaries_and_offsets(spark):
    # group g: 3+4+5 tokens; budget 6 -> starts 0,3,7 -> packs 0,0,1
    docs = spark.createDataFrame(
        [(1, "g", "a b c"), (2, "g", "d e f g"), (3, "g", "h i j k l"),
         (4, "h", "x y")],
        ["doc_id", "source", "text"])
    got = {r.doc_id: (r.n_tokens, r.tok_start, r.pack_id)
           for r in sequence_pack(docs, budget=6).collect()}
    assert got == {1: (3, 0, 0), 2: (4, 3, 0), 3: (5, 7, 1),
                   4: (2, 0, 0)}  # groups pack independently


def test_pack_rejects_bad_budget(spark):
    docs = spark.createDataFrame([(1, "g", "a")], ["doc_id", "source", "text"])
    with pytest.raises(ValueError):
        sequence_pack(docs, budget=0)


def test_split_deterministic_and_weighted(spark):
    docs = spark.createDataFrame([(i,) for i in range(2000)], ["doc_id"])
    a = {r.doc_id: r.split for r in
         split_assign(docs, {"train": 0.9, "val": 0.1}).collect()}
    b = {r.doc_id: r.split for r in
         split_assign(docs, {"train": 0.9, "val": 0.1}).collect()}
    assert a == b  # pure function of the id
    frac_train = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.87 < frac_train < 0.93
    # different salt -> different assignment (at least somewhere)
    c = {r.doc_id: r.split for r in
         split_assign(docs, {"train": 0.9, "val": 0.1}, salt="v2").collect()}
    assert c != a


def test_pack_two_phase_equals_single_window(spark):
    """The distributed two-phase prefix sum must equal the naive
    single-window spec exactly, on multi-partition data with a giant
    skewed group and several bucket boundaries in play."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rnd = random.Random(7)
    rows = []
    for i in range(4000):
        src = "big" if i % 10 else f"s{i % 7}"    # one giant group
        rows.append((i, src, "t " * rnd.randint(1, 12)))
    docs = spark.createDataFrame(
        rows, ["doc_id", "source", "text"]).repartition(16)

    got = {r.doc_id: (r.n_tokens, r.tok_start, r.pack_id)
           for r in sequence_pack(docs, budget=50, n_buckets=13).collect()}

    from lucenenet_spark.functions import textstats as ts
    w = Window.partitionBy("source").orderBy("doc_id")
    ref = docs.withColumn(
        "n_tokens", ts.ws_token_count(F.col("text")).cast("long"))
    ref = (ref.withColumn(
        "tok_start", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn("pack_id", F.floor(F.col("tok_start") / F.lit(50))))
    want = {r.doc_id: (r.n_tokens, r.tok_start, r.pack_id)
            for r in ref.collect()}
    assert got == want


def test_pack_parallelism_not_bound_by_group_count(spark):
    """The scale property the rewrite buys: with ONE group, the
    within-bucket windows still split across n_buckets partitions (the
    old plan had exactly one window partition)."""
    docs = spark.createDataFrame(
        [(i, "only", "a b c") for i in range(500)],
        ["doc_id", "source", "text"]).repartition(8)
    out = sequence_pack(docs, budget=10, n_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the heavy window partitions by (group, _bucket), not group alone
    assert "_bucket" in plan
    got = sorted((r.doc_id, r.tok_start) for r in out.collect())
    assert got[0] == (0, 0) and got[1] == (1, 3)
    assert got[-1] == (499, 3 * 499)
