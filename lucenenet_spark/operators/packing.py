"""Training-data batch shaping: sequence packing and deterministic
splits.

No reference counterpart (Lucene stops at retrieval); these are the
operators an LLM training pipeline runs BETWEEN this engine's dedup/
quality stages and the trainer — part of the SURVEY §2 extension
surface, same tier as operators/dedup.py.

sequence_pack — the concat-and-chunk regime: documents are laid out in
a deterministic order and cut into packs of ~budget tokens.  Each doc
gets pack_id = the pack its FIRST token falls in (start-offset
binning).  A pack can overrun the budget by at most one document's
tail (the standard concat-and-chunk property — trainers truncate or
span the boundary); what matters at 100 TB is that the layout is
deterministic and shuffle-light.

Scale shape (two-phase distributed prefix sum, all JVM expressions):
a naive `sum() over (partition by group order by order)` window would
serialize each group into ONE task — with a handful of sources over
100 TB that is a single-core scan of the whole corpus.  Instead the
order axis is cut into B quantile buckets (bucket = monotone pure
function of order_col, so it travels as data and is immune to
partition renumbering), then

  tok_start = cross-bucket offset[group, bucket] + within-bucket prefix

where the offsets come from a window over the (group x bucket)
AGGREGATE table (<= G*B rows, never corpus rows) and the within-bucket
prefix windows partition by (group, bucket) — parallelism = G*B, so a
giant group is split B ways instead of landing on one core.  No
Python, no driver-side data rows (only B-1 quantile boundaries).

split_assign — deterministic train/val/test assignment by salted hash:
stable across runs and cluster layouts (pure function of the id), no
sampling state, exactly reproducible by any other engine — the
property row-level random() splits lack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import textstats as ts


def sequence_pack(docs: DataFrame, budget: int,
                  group_col: str = "source", order_col: str = "doc_id",
                  text_col: str = "text",
                  n_tokens: Column | None = None,
                  n_buckets: int | None = None) -> DataFrame:
    """(doc_id-ish rows) -> + n_tokens, tok_start, pack_id.

    pack_id = group-local index of the budget window containing the
    doc's first token under the deterministic (group_col, order_col)
    layout; tok_start = that first-token offset within the group.

    Two-phase prefix sum (see module docstring): order_col is cut into
    `n_buckets` quantile buckets (default 4x the session parallelism)
    so the running sum of a giant group is computed B-ways parallel.
    order_col must be numeric (it is the bucketing axis)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = docs.sparkSession
    b = int(n_buckets or 4 * spark.sparkContext.defaultParallelism)
    toks = (n_tokens if n_tokens is not None
            else ts.ws_token_count(F.col(text_col))).cast("long")
    out = docs.withColumn("n_tokens", toks)

    if not isinstance(out.schema[order_col].dataType,
                      (T.NumericType, T.DateType, T.TimestampType)):
        raise TypeError(
            f"sequence_pack: order_col '{order_col}' must be numeric/"
            f"temporal (the distributed prefix sum buckets on it)")

    # phase 0 (metadata-scale): B-1 approximate quantile boundaries of
    # the order axis — collected ONCE, then literals in the plan.  Any
    # monotone boundary set is CORRECT (it only balances work), so the
    # approximation error never affects output values.
    qs = [i / b for i in range(1, b)]
    bounds = sorted(set(
        out.select(F.col(order_col).cast("double").alias("_o"))
        .approxQuantile("_o", qs, 0.001)))
    # O(B) fused comparisons per row (cheap next to tokenization); the
    # sorted-boundary count IS the bucket index, monotone in order_col
    out = out.withColumn("_o", F.col(order_col).cast("double"))
    bucket = F.lit(0)
    for v in bounds:
        bucket = bucket + F.when(F.col("_o") >= F.lit(float(v)), 1) \
            .otherwise(0)
    out = out.withColumn("_bucket", bucket).drop("_o")

    # phase 1: per-(group, bucket) token sums, then cross-bucket offsets
    # via a window over the AGGREGATE table (<= G*B rows, milliseconds)
    wb = Window.partitionBy(group_col).orderBy("_bucket")
    offs = (out.groupBy(group_col, "_bucket")
            .agg(F.sum("n_tokens").alias("_bsum"))
            .withColumn("_boff",
                        F.sum("_bsum").over(wb) - F.col("_bsum"))
            .drop("_bsum"))

    # phase 2: within-bucket prefix (window partitioned by group AND
    # bucket — a giant group splits B ways) + the offset join.  The join
    # key equals the window partitioning, so the shuffle is shared; AQE
    # broadcasts the aggregate side when it is small.
    ww = Window.partitionBy(group_col, "_bucket").orderBy(order_col)
    local = F.sum("n_tokens").over(ww) - F.col("n_tokens")
    return (out
            .join(offs, [group_col, "_bucket"])
            .withColumn("tok_start", F.col("_boff") + local)
            .withColumn("pack_id",
                        F.floor(F.col("tok_start") / F.lit(budget)))
            .select(*docs.columns, "n_tokens", "tok_start", "pack_id"))


def split_assign(docs: DataFrame, weights: dict[str, float],
                 id_col: str = "doc_id", salt: str = "split") -> DataFrame:
    """+ split column: deterministic weighted assignment by salted hash.

    Buckets are the first 15 hex chars of md5(salt || id) scaled to
    [0, 1) — exactly reproducible in any engine with md5 (the DuckDB
    oracle recomputes it bit-for-bit).  Split names are assigned in
    sorted-name order over cumulative weight boundaries."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = (F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"),
                                           F.col(id_col).cast("string"))),
                            1, 15), 16, 10).cast("double")
         / F.lit(float(16 ** 15)))
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return docs.withColumn("split", split)
