"""Similarity search over embedding columns (array<float>).

- cosine_topk: exact brute-force top-k — the correctness baseline.  Dot
  product via zip_with + aggregate (JVM higher-order functions, double
  precision); top-k via orderBy().limit() == TakeOrderedAndProject
  (per-partition heap + driver merge), so the scan is embarrassingly
  parallel and never materializes a global sort.
- cosine_pairs: all pairs above a similarity threshold (embedding near-dup).
  Sandbox uses a block-nested join; at scale swap in the LSH bucketing
  below.
- rp_lsh_topk: random-hyperplane LSH bucketed ANN — the scale path.
  Hyperplanes are md5-derived (deterministic, no RNG state to ship);
  candidates = vectors sharing the query's bucket in >=1 of `tables`
  hash tables, then exact re-rank.  Recall < 1 by construction; the
  correctness gate for it is rows-only (documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ROUND = 6


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_id: int | None = None) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    out = emb.select(F.col(id_col).alias("vec_id"),
                     F.round(cos, ROUND).alias("cosine"))
    if exclude_id is not None:
        out = out.where(F.col("vec_id") != exclude_id)
    return out.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)


def cosine_pairs(emb: DataFrame, threshold: float = 0.9,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_a, vec_b, cosine) for pairs above threshold (near-dup by
    embedding).  O(n^2) comparisons — at scale use rp_lsh buckets first."""
    a = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cos, ROUND).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _hyperplane(table: int, plane: int, dim: int) -> list:
    """Deterministic pseudo-random hyperplane components in [-1, 1] derived
    from md5 — reproducible on any engine, no RNG state."""
    import hashlib

    comps = []
    for d in range(dim):
        h = int(hashlib.md5(f"{table}:{plane}:{d}".encode()).hexdigest()[:15], 16)
        comps.append(h / float(1 << 59) - 1.0)
    return comps


def rp_bucket(vec_col, table: int, planes: int, dim: int) -> F.Column:
    """Random-projection bucket id: sign bit per hyperplane."""
    bucket = F.lit(0)
    for p in range(planes):
        comps = _hyperplane(table, p, dim)
        plane = F.array(*[F.lit(c) for c in comps])
        bit = F.when(_dot(vec_col, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def rp_lsh_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                tables: int = 4, planes: int = 8,
                exclude_id: int | None = None) -> DataFrame:
    """Approximate top-k: candidates share the query's bucket in >=1 hash
    table; exact cosine re-rank on the candidate set.  At 100TB the
    bucketed table is precomputed/persisted and the probe is a pruned scan."""
    dim = len(query_vec)
    import hashlib  # noqa: F401  (used via _hyperplane)

    cand = None
    for t in range(tables):
        qb = _bucket_of(query_vec, t, planes)
        c = emb.where(rp_bucket(F.col(vec_col), t, planes, dim) == F.lit(qb))
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates([id_col])
    return cosine_topk(cand, query_vec, k, id_col, vec_col, exclude_id)


def _bucket_of(vec: list[float], table: int, planes: int) -> int:
    b = 0
    for p in range(planes):
        comps = _hyperplane(table, p, len(vec))
        dot = sum(float(x) * c for x, c in zip(vec, comps))
        if dot >= 0:
            b |= 1 << p
    return b


# ------------------------------------------------------------------- IVF

def ivf_assign(emb: DataFrame, nlist: int = 16, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Coarse quantization: cell = argmax-cosine centroid; centroids are
    the embeddings of the `nlist` lowest vec_ids (deterministic, oracle-
    reproducible — a k-means refinement would drop in here without
    changing the probe path). Ties broken by lower centroid id; cosines
    rounded to 6dp first so Spark and the SQL oracle agree bit-for-bit."""
    cents = sorted(
        (r[0], [float(x) for x in r[1]])
        for r in emb.select(id_col, vec_col).where(F.col(id_col) < nlist).collect()
    )
    scored = F.array(*[
        F.struct(
            (-F.round(_dot(F.col(vec_col), F.array(*[F.lit(c) for c in cv]))
                      / (_norm(F.col(vec_col))
                         * F.lit(sum(c * c for c in cv) ** 0.5)), ROUND)
             ).alias("negcos"),
            F.lit(int(cid)).alias("cid"),
        )
        for cid, cv in cents
    ])
    best = F.array_min(scored)["cid"]
    return emb.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("embedding"),
                      best.alias("cell"))


def ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             nlist: int = 16, nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding",
             exclude_id: int | None = None) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query, exact-scan only
    the nprobe nearest cells. Deterministic end-to-end, so (unlike rp_lsh)
    this has an exact SQL oracle. At 100TB the assignment table is
    precomputed and partitioned BY cell — a probe prunes to nprobe
    partitions before any distance math."""
    assigned = ivf_assign(emb, nlist, id_col, vec_col)
    cents = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.select(id_col, vec_col).where(F.col(id_col) < nlist).collect()
    }
    qn = sum(x * x for x in query_vec) ** 0.5

    def cos_to_q(cv):
        cn = sum(c * c for c in cv) ** 0.5
        return round(sum(float(a) * c for a, c in zip(query_vec, cv)) / (qn * cn), ROUND)

    probe = sorted(cents, key=lambda cid: (-cos_to_q(cents[cid]), cid))[:nprobe]
    cand = assigned.where(F.col("cell").isin(probe))
    return cosine_topk(cand, query_vec, k, "vec_id", "embedding", exclude_id)
