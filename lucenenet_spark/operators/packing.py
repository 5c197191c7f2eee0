"""Training-data batch shaping: sequence packing and deterministic
splits.

No reference counterpart (Lucene stops at retrieval); these are the
operators an LLM training pipeline runs BETWEEN this engine's dedup/
quality stages and the trainer — part of the SURVEY §2 extension
surface, same tier as operators/dedup.py.

sequence_pack — the concat-and-chunk regime: documents are laid out in
a deterministic order and cut into packs of ~budget tokens.  Each doc
gets pack_id = the pack its FIRST token falls in (start-offset
binning): one window aggregation, no stateful loop, and the whole
computation is a single JVM expression over a running sum.  A pack can
overrun the budget by at most one document's tail (the standard
concat-and-chunk property — trainers truncate or span the boundary);
what matters at 100 TB is that the layout is deterministic and
shuffle-light.  Scale shape: the window partitions by `group_col`
(packing never crosses groups), so parallelism = number of groups and
no global sort exists.  Group sizes are corpus-partition sized (a
source/shard column), not corpus sized.

split_assign — deterministic train/val/test assignment by salted hash:
stable across runs and cluster layouts (pure function of the id), no
sampling state, exactly reproducible by any other engine — the
property row-level random() splits lack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textstats as ts


def sequence_pack(docs: DataFrame, budget: int,
                  group_col: str = "source", order_col: str = "doc_id",
                  text_col: str = "text",
                  n_tokens: Column | None = None) -> DataFrame:
    """(doc_id-ish rows) -> + n_tokens, tok_start, pack_id.

    pack_id = group-local index of the budget window containing the
    doc's first token under the deterministic (group_col, order_col)
    layout; tok_start = that first-token offset within the group."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = (n_tokens if n_tokens is not None
            else ts.ws_token_count(F.col(text_col))).cast("long")
    w = Window.partitionBy(group_col).orderBy(order_col)
    out = docs.withColumn("n_tokens", toks)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (out
            .withColumn("tok_start", start)
            .withColumn("pack_id",
                        F.floor(F.col("tok_start") / F.lit(budget))))


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
