"""Operator-level properties of the dedup/ANN pipeline ops: skew guards,
prefix dedup keys, and the bucketed embedding near-dup path (the contract
entries exercise these against DuckDB oracles; these tests pin the
behavioral properties directly)."""

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.operators import ann, dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = []
    for i in range(20):
        # every doc shares the same first 8 words (64+ chars of boilerplate
        # prefix and one corpus-wide hot shingle run), then diverges
        rows.append((i, base + f" unique tail {i} zz{i} yy{i} xx{i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dups_prefix_key(spark, docs):
    assert dedup.exact_dups(docs).count() == 0  # no byte-identical docs
    pref = dedup.exact_dups(docs, key_chars=32).collect()
    assert len(pref) == 1 and pref[0]["n_dups"] == 20
    assert pref[0]["canonical_id"] == 0


def test_shingle_df_guard_drops_hot_shingles(spark, docs):
    # every pair shares the boilerplate shingles -> without the guard the
    # pair count is ~n^2; the guard (df > 5) removes corpus-wide shingles
    # so the divergent tails push every pair below the threshold
    open_pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3)
    guarded = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3,
                                        max_shingle_df=5)
    assert open_pairs.count() == 20 * 19 // 2
    assert guarded.count() == 0


def test_minhash_bucket_guard_kills_degenerate_bucket(spark):
    same = [(i, "identical template text repeated verbatim") for i in range(30)]
    df = spark.createDataFrame(same, "doc_id long, text string")
    open_pairs = dedup.minhash_lsh_pairs(df, num_hashes=16, bands=2,
                                         threshold=0.9, reuse_cache=False)
    guarded = dedup.minhash_lsh_pairs(df, num_hashes=16, bands=2,
                                      threshold=0.9, max_bucket_size=10,
                                      reuse_cache=False)
    assert open_pairs.count() == 30 * 29 // 2  # one degenerate bucket
    assert guarded.count() == 0                # guard sacrifices it


@pytest.fixture(scope="module")
def emb(spark):
    import hashlib
    rows = []
    for i in range(40):
        # deterministic pseudo-random unit-ish vectors
        v = [(int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:8], 16)
              / 2**31) - 1.0 for d in range(16)]
        rows.append((i, v))
    # three exact duplicates of vector 0 -> cosine 1.0 pairs
    for j, i in enumerate((100, 101, 102)):
        rows.append((i, rows[0][1]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bucketed_pairs_subset_of_exact_with_full_dup_recall(spark, emb):
    exact = {(r["vec_a"], r["vec_b"]): r["cosine"]
             for r in ann.cosine_pairs(emb, threshold=0.99).collect()}
    bucketed = {(r["vec_a"], r["vec_b"]): r["cosine"]
                for r in ann.cosine_pairs_bucketed(
                    emb, threshold=0.99, tables=4, planes=8).collect()}
    # identical vectors always share every bucket -> recall 1.0 on true
    # dups, and the bucketed result can never invent a pair
    dup_pairs = {(0, 100), (0, 101), (0, 102), (100, 101), (100, 102),
                 (101, 102)}
    assert dup_pairs <= set(exact)
    assert set(bucketed) == set(exact)
    for p, c in bucketed.items():
        assert c == pytest.approx(exact[p])


def test_bucketed_moderate_threshold_subset(spark, emb):
    exact = {(r["vec_a"], r["vec_b"])
             for r in ann.cosine_pairs(emb, threshold=0.3).collect()}
    bucketed = {(r["vec_a"], r["vec_b"])
                for r in ann.cosine_pairs_bucketed(
                    emb, threshold=0.3, tables=8, planes=4).collect()}
    assert bucketed <= exact  # candidates only prune, never invent
