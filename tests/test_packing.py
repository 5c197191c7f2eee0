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
