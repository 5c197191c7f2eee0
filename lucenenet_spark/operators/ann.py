"""Similarity search over embedding columns (array<float>).

- cosine_topk: exact brute-force top-k — the correctness baseline.  Dot
  product via zip_with + aggregate (JVM higher-order functions, double
  precision); top-k via orderBy().limit() == TakeOrderedAndProject
  (per-partition heap + driver merge), so the scan is embarrassingly
  parallel and never materializes a global sort.
- cosine_pairs: all pairs above a similarity threshold (embedding near-dup).
  Sandbox uses a block-nested join; at scale swap in the LSH bucketing
  below.
- rp_bucket_table + rp_lsh_topk: random-hyperplane LSH bucketed ANN — the
  scale path.  The bucket table is computed in ONE pass (a vectorized
  Arrow kernel assigns all `tables` bucket ids per row); at 100 TB it is
  persisted partitioned by bucket so a probe is a partition-pruned read.
  A probe is a single filtered scan (OR over the per-table bucket
  equalities) — never `tables` separate scans — followed by an exact
  cosine re-rank of the candidates.
- ivf_topk: inverted-file probe.  Centroid assignment is a BROADCAST join
  against a centroid DataFrame (no centroid vectors ever appear as plan
  literals — at nlist=64k literal embedding arrays would be a
  multi-megabyte plan), argmax via a partial-aggregated min(struct).

Determinism: hyperplanes are md5-derived and every dot product is an
explicit LEFT FOLD in float64 (Spark `aggregate`, numpy per-dimension
accumulation, DuckDB `list_reduce` all associate identically), so bucket
signs are bit-identical across the engine, the driver-side query-bucket
computation, and the DuckDB oracle — which is what lets the "approximate"
LSH operator have an EXACT correctness oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

ROUND = 6
RP_SCALE = float(1 << 59)  # md5-60bit -> [-1, 1) hyperplane components


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


def cosine_pairs_bucketed(emb: DataFrame, threshold: float = 0.4,
                          tables: int = 8, planes: int = 4,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          bucket_table: DataFrame | None = None) -> DataFrame:
    """Embedding near-dup pairs via RP-LSH candidate generation — the
    100 TB path that replaces cosine_pairs' all-pairs cross join.

    Candidates = pairs sharing a bucket in >=1 hash table (the same
    deterministic md5-hyperplane buckets as rp_lsh_topk, so the DuckDB
    oracle reproduces the EXACT candidate set); each candidate is then
    verified with the exact cosine kernel.  Shuffles: one on
    (table, bucket), one pair-distinct, two hash joins to fetch vectors
    — never doc x doc.  Recall is the LSH S-curve at (tables, planes);
    defaults tuned so moderate-similarity pairs survive.  Pass a
    persisted `bucket_table` to skip recomputation (at scale it is
    bucketBy-partitioned and this becomes a co-located join)."""
    bt = bucket_table if bucket_table is not None else rp_bucket_table(
        emb, tables, planes, None, id_col, vec_col)
    keyed = bt.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.array(*[F.col(f"b{t}") for t in range(tables)]))
        .alias("t", "bucket"))
    a = keyed.select("t", "bucket", F.col("vid").alias("vec_a"))
    b = keyed.select("t", "bucket", F.col("vid").alias("vec_b"))
    cand = (a.join(b, ["t", "bucket"])
            .where(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b").distinct())
    pa = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    pb = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb")))
    return (cand.join(pa, "vec_a").join(pb, "vec_b")
            .select("vec_a", "vec_b", F.round(cos, ROUND).alias("cosine"))
            .where(F.col("cosine") >= threshold))


def _hyperplane(table: int, plane: int, dim: int) -> list:
    """Deterministic pseudo-random hyperplane components in [-1, 1) derived
    from md5 — reproducible on any engine, no RNG state."""
    import hashlib

    comps = []
    for d in range(dim):
        h = int(hashlib.md5(f"{table}:{plane}:{d}".encode()).hexdigest()[:15], 16)
        comps.append(h / RP_SCALE - 1.0)
    return comps


def rp_bucket_table(emb: DataFrame, tables: int = 4, planes: int = 8,
                    dim: int | None = None, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(id, embedding, b0..b{tables-1}) in ONE Arrow-vectorized pass.

    The kernel rebuilds the md5 hyperplanes locally (no closure data) and
    accumulates each dot product dimension-by-dimension in float64 — the
    same left-fold association as the SQL oracle's `list_reduce` and the
    driver's `_bucket_of`, so bucket signs are bit-identical everywhere.
    At 100 TB: persist this table partitioned by (b0) (or bucketBy over
    all tables) and the probe below becomes a partition-pruned read."""
    import numpy as np

    if planes > 31:
        # bucket ids are packed into int32; >31 planes would silently
        # overflow the shift/cast and diverge from _bucket_of + the oracle
        raise ValueError(f"planes must be <= 31 (got {planes}); "
                         "int32 bucket packing")
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    hp = [[_hyperplane(t, p, dim) for p in range(planes)]
          for t in range(tables)]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.vstack([np.asarray(v, np.float64) for v in vecs])
        out = np.zeros((len(m), tables), np.int64)
        for t in range(tables):
            for p in range(planes):
                plane = hp[t][p]
                acc = np.zeros(len(m))
                for d in range(dim):        # explicit left fold per dim
                    acc += m[:, d] * plane[d]
                out[:, t] |= (acc >= 0).astype(np.int64) << p
        return pd.Series(list(out.astype(np.int32)))

    b = buckets(F.col(vec_col))
    return emb.select(
        F.col(id_col), F.col(vec_col),
        *[F.element_at(b, t + 1).alias(f"b{t}") for t in range(tables)],
    )


def rp_lsh_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                tables: int = 4, planes: int = 8,
                exclude_id: int | None = None,
                bucket_table: DataFrame | None = None) -> DataFrame:
    """Approximate top-k: candidates share the query's bucket in >=1 hash
    table; exact cosine re-rank on the candidate set.  ONE filtered scan of
    the bucket table (pass a persisted `rp_bucket_table` result to skip
    recomputation; at 100 TB that read is partition-pruned by bucket)."""
    dim = len(query_vec)
    bt = bucket_table if bucket_table is not None else rp_bucket_table(
        emb, tables, planes, dim, id_col, vec_col)
    pred = F.lit(False)
    for t in range(tables):
        pred = pred | (F.col(f"b{t}") == F.lit(_bucket_of(query_vec, t, planes)))
    cand = bt.where(pred).select(id_col, vec_col)
    return cosine_topk(cand, query_vec, k, id_col, vec_col, exclude_id)


def _bucket_of(vec: list[float], table: int, planes: int) -> int:
    b = 0
    for p in range(planes):
        comps = _hyperplane(table, p, len(vec))
        dot = 0.0
        for x, c in zip(vec, comps):        # left fold, float64
            dot = dot + float(x) * c
        if dot >= 0:
            b |= 1 << p
    return b


# ------------------------------------------------------------------- IVF

def ivf_centroids(emb: DataFrame, nlist: int = 16, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Centroid table (cid, cv): the embeddings of the `nlist` lowest
    vec_ids (deterministic, oracle-reproducible — a k-means refinement
    would drop in here without changing the probe path)."""
    return (emb.where(F.col(id_col) < nlist)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")))


def ivf_assign(emb: DataFrame, nlist: int = 16, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Coarse quantization: cell = argmax-cosine centroid via a BROADCAST
    join against the centroid table + min(struct) argmin — the per-row
    x nlist fan-out is collapsed map-side by partial aggregation, so the
    shuffle ships ONE row per vector regardless of nlist (and the plan
    carries no literal vectors, so nlist=64k is plan-size-free).  Ties
    broken by lower centroid id; cosines rounded to 6dp first so Spark
    and the SQL oracle agree bit-for-bit."""
    cents = ivf_centroids(emb, nlist, id_col, vec_col)
    cos = F.round(
        _dot(F.col(vec_col), F.col("cv"))
        / (_norm(F.col(vec_col)) * _norm(F.col("cv"))), ROUND)
    joined = (
        emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).alias("embedding"))
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding",
                F.struct((-cos).alias("negcos"),
                         F.col("cid").alias("cid")).alias("sc"))
    )
    best = joined.groupBy("vec_id").agg(
        F.min("sc").alias("m"), F.first("embedding").alias("embedding"))
    return best.select("vec_id", "embedding", F.col("m.cid").alias("cell"))


def ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             nlist: int = 16, nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding",
             exclude_id: int | None = None,
             assigned: DataFrame | None = None) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query, exact-scan only
    the nprobe nearest cells. Deterministic end-to-end, so (like rp_lsh)
    this has an exact SQL oracle. At 100TB the assignment table is
    precomputed (pass `assigned`) and partitioned BY cell — a probe prunes
    to nprobe partitions before any distance math.  Probe selection runs
    on the driver over the (tiny) collected centroid set — nlist rows,
    not data-scale."""
    if assigned is None:
        assigned = ivf_assign(emb, nlist, id_col, vec_col)
    cents = {
        r["cid"]: [float(x) for x in r["cv"]]
        for r in ivf_centroids(emb, nlist, id_col, vec_col).collect()
    }
    qn = sum(x * x for x in query_vec) ** 0.5

    def cos_to_q(cv):
        cn = sum(c * c for c in cv) ** 0.5
        return round(sum(float(a) * c for a, c in zip(query_vec, cv)) / (qn * cn), ROUND)

    probe = sorted(cents, key=lambda cid: (-cos_to_q(cents[cid]), cid))[:nprobe]
    cand = assigned.where(F.col("cell").isin(probe))
    return cosine_topk(cand, query_vec, k, "vec_id", "embedding", exclude_id)


# ------------------------------------------------------------- SQ8 ANN


def sq8_params(emb: DataFrame, vec_col: str = "embedding",
               dim: int | None = None) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus — the scalar-quantization
    codebook.  One narrow agg (2*dim scalar aggregates, map-side
    combined); the returned lists are dim-sized metadata, like IVF's
    centroid set."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    aggs = ([F.min(F.element_at(F.col(vec_col), i + 1).cast("double"))
             for i in range(dim)]
            + [F.max(F.element_at(F.col(vec_col), i + 1).cast("double"))
               for i in range(dim)])
    row = emb.agg(*aggs).collect()[0]
    return list(row[:dim]), list(row[dim:])


def sq8_encode(emb: DataFrame, mins: list[float], maxs: list[float],
               id_col: str = "vec_id", vec_col: str = "embedding",
               code_col: str = "codes") -> DataFrame:
    """uint8 codes: c_i = floor((x_i - mn_i)/(mx_i - mn_i) * 255 + 0.5)
    (flat dims -> 0).  floor(+0.5) rather than round() pins the halfway
    case identically in Spark and DuckDB.  32x smaller than float32*8 at
    rest — the memory-bound ANN trade at 100 TB."""
    mn = F.array(*[F.lit(float(v)) for v in mins])
    span = F.array(*[F.lit(float(b) - float(a))
                     for a, b in zip(mins, maxs)])
    codes = F.zip_with(
        F.zip_with(F.col(vec_col), mn,
                   lambda x, m: x.cast("double") - m),
        span,
        lambda d, s: F.when(s == 0.0, F.lit(0)).otherwise(
            F.floor(d / s * 255.0 + 0.5).cast("int")))
    return emb.select(F.col(id_col), codes.alias(code_col))


def sq8_codes_table(emb: DataFrame,
                    params: tuple[list[float], list[float]] | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> tuple[tuple[list[float], list[float]], DataFrame]:
    """The at-rest SQ8 artifact: (params, codes) where codes is the
    (vec_id, codes: array<int>) table — encode ONCE, persist, query many
    times (the `rp_bucket_table` pattern).  At 100 TB the codes table IS
    the point of SQ8: 32x smaller than the float32 embeddings, so it
    fits executor memory / fast storage while the raw vectors stay cold;
    the params (2*dim floats) live next to it as metadata.  Neither the
    2*dim full-corpus agg (params) nor the encode pass ever re-runs on
    the query path."""
    if params is None:
        params = sq8_params(emb, vec_col)
    return params, sq8_encode(emb, params[0], params[1], id_col, vec_col)


def _sq8_rank(codes: DataFrame, params: tuple[list[float], list[float]],
              query_vec: list[float], k: int,
              exclude_id: int | None, code_col: str = "codes") -> DataFrame:
    """Asymmetric-distance top-k over a codes frame: full-precision
    query vs reconstructed database vectors, column algebra + the same
    TakeOrderedAndProject as the exact path."""
    mins, maxs = params
    mn = F.array(*[F.lit(float(v)) for v in mins])
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    # reconstruction: x'_i = mn_i + c_i * span_i / 255
    steps = F.array(*[F.lit((float(b) - float(a)) / 255.0)
                      for a, b in zip(mins, maxs)])
    xr = F.zip_with(
        F.zip_with(F.col(code_col), steps,
                   lambda c, st: c.cast("double") * st),
        mn, lambda v, m: v + m)
    cos = _dot(xr, q) / (_norm(xr) * _norm(q))
    out = codes.select(F.col("vec_id"),
                       F.round(cos, ROUND).alias("cosine"))
    if exclude_id is not None:
        out = out.where(F.col("vec_id") != exclude_id)
    return out.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)


def sq8_topk(emb: DataFrame | None, query_vec: list[float], k: int = 10,
             params: tuple[list[float], list[float]] | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_id: int | None = None,
             codes: DataFrame | None = None) -> DataFrame:
    """Top-k cosine against the RECONSTRUCTED (quantized) vectors — the
    asymmetric-distance convention: the query stays full-precision, the
    database side pays the compression.

    Pass `codes` (+ `params`) from sq8_codes_table to query the
    persisted at-rest artifact — nothing corpus-wide recomputes per
    query.  Without `codes` the encode runs in-plan over `emb` (one
    scan; sandbox convenience)."""
    if codes is not None:
        if params is None:
            raise ValueError(
                "sq8_topk: a persisted codes table needs its params — "
                "re-deriving them would rescan the full corpus per query")
        return _sq8_rank(codes, params, query_vec, k, exclude_id)
    if params is None:
        params = sq8_params(emb, vec_col)
    codes = sq8_encode(emb, params[0], params[1], id_col, vec_col)
    return _sq8_rank(codes, params, query_vec, k, exclude_id)


def ivf_sq8_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                 nlist: int = 16, nprobe: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 exclude_id: int | None = None,
                 assigned: DataFrame | None = None,
                 codes: DataFrame | None = None,
                 params: tuple[list[float], list[float]] | None = None
                 ) -> DataFrame:
    """IVF coarse probe x SQ8 fine scoring — the memory-bound ANN shape
    at 100 TB: the cell-partitioned assignment table prunes the search
    to nprobe cells, and the surviving candidates are scored against the
    uint8 codes table (32x at rest) with a full-precision query —
    asymmetric distance, never touching the raw float vectors on the
    query path.  Probe selection (full-precision centroid cosines, ties
    to lower cid) and the assignment argmax are exactly ivf_topk's.

    At scale, `assigned` (partitioned BY cell), `codes`, and `params`
    are precomputed artifacts; the sandbox default derives them in-plan
    from `emb`."""
    if assigned is None:
        assigned = ivf_assign(emb, nlist, id_col, vec_col)
    if codes is None:
        params, codes = sq8_codes_table(emb, params, id_col, vec_col)
    elif params is None:
        raise ValueError("ivf_sq8_topk: codes table needs its params")
    cents = {
        r["cid"]: [float(x) for x in r["cv"]]
        for r in ivf_centroids(emb, nlist, id_col, vec_col).collect()
    }
    qn = sum(x * x for x in query_vec) ** 0.5

    def cos_to_q(cv):
        cn = sum(c * c for c in cv) ** 0.5
        return round(sum(float(a) * c for a, c in zip(query_vec, cv))
                     / (qn * cn), ROUND)

    probe = sorted(cents, key=lambda cid: (-cos_to_q(cents[cid]), cid))[:nprobe]
    cand = assigned.where(F.col("cell").isin(probe)).select("vec_id")
    return _sq8_rank(codes.join(cand, "vec_id"), params, query_vec,
                     k, exclude_id)
