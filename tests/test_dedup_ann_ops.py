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


def test_sq8_codes_and_recall(spark):
    """SQ8: codes bounded to [0,255], flat dims encode to 0, and the
    quantized top-k stays close to exact (64-dim, 8-bit -> near-perfect
    recall on well-spread vectors)."""
    import numpy as np
    from pyspark.sql import functions as F

    from lucenenet_spark.operators import ann

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(300, 8)).astype("float32")
    vecs[:, 3] = 0.5  # a flat dimension
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    mins, maxs = ann.sq8_params(emb)
    assert mins[3] == maxs[3] == pytest.approx(0.5)
    codes = ann.sq8_encode(emb, mins, maxs).collect()
    for r in codes:
        assert all(0 <= c <= 255 for c in r["codes"])
        assert r["codes"][3] == 0  # flat dim
    q = [float(x) for x in vecs[0]]
    exact = [r["vec_id"] for r in
             ann.cosine_topk(emb, q, k=10, exclude_id=0).collect()]
    sq8 = [r["vec_id"] for r in
           ann.sq8_topk(emb, q, k=10, params=(mins, maxs),
                        exclude_id=0).collect()]
    overlap = len(set(exact) & set(sq8))
    assert overlap >= 8  # 8-bit quantization barely moves the ranking


def test_sq8_persisted_codes_path(spark):
    """The persisted codes-table path (sq8_codes_table + codes= query)
    must return exactly the in-plan encode path, and require params
    alongside codes (no hidden corpus rescan per query)."""
    import numpy as np

    from lucenenet_spark.operators import ann

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[3]]

    inplan = [(r.vec_id, r.cosine)
              for r in ann.sq8_topk(emb, q, k=8, exclude_id=3).collect()]
    params, codes = ann.sq8_codes_table(emb)
    codes = codes.cache()
    persisted = [(r.vec_id, r.cosine)
                 for r in ann.sq8_topk(None, q, k=8, exclude_id=3,
                                       params=params,
                                       codes=codes).collect()]
    assert persisted == inplan
    with pytest.raises(ValueError, match="params"):
        ann.sq8_topk(None, q, codes=codes)


def test_ivf_sq8_composition(spark):
    """IVF x SQ8: the composed probe returns the SQ8 scores of exactly
    the candidates ivf_topk would scan — i.e. it equals sq8-scoring
    restricted to the probed cells."""
    import numpy as np
    from pyspark.sql import functions as F

    from lucenenet_spark.operators import ann

    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(240, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[0]]

    got = [(r.vec_id, r.cosine)
           for r in ann.ivf_sq8_topk(emb, q, k=10, nlist=8, nprobe=3,
                                     exclude_id=0).collect()]
    # independent recomposition: candidates from the ivf assignment,
    # scored with the plain SQ8 ranker
    assigned = ann.ivf_assign(emb, nlist=8)
    exact_ivf = ann.ivf_topk(emb, q, k=10**6, nlist=8, nprobe=3,
                             exclude_id=0, assigned=assigned)
    cand_ids = {r.vec_id for r in exact_ivf.collect()}
    params, codes = ann.sq8_codes_table(emb)
    full_sq8 = ann.sq8_topk(None, q, k=10**6, params=params, codes=codes,
                            exclude_id=0).collect()
    want = [(r.vec_id, r.cosine) for r in full_sq8
            if r.vec_id in cand_ids][:10]
    assert got == want
    assert 0 < len(cand_ids) < 240  # the probe really pruned
