"""Deterministic stratified sampling and eval-set contamination — two
training-data-pipeline operators over the documents table.

Stratified sampling re-expresses ``df.sampleBy`` WITHOUT RNG state:
keep a doc iff its salted md5 bucket falls below the stratum's
fraction.  Determinism is the point at pipeline scale — re-runs,
retries, and independent engines (the DuckDB oracle) all select the
SAME rows, and a doc's fate never depends on partitioning or row
order.  One narrow projection, no shuffle.

Contamination flags training docs sharing word n-grams with an
evaluation/benchmark set — the standard decontamination pass (e.g.
GPT-3-style 13-gram overlap checks; here n is a parameter).  Shape:
eval-side DISTINCT shingles (small — benchmark-sized) broadcast-join
against the docs' shingle stream; output per contaminated doc = hit
count + contamination ratio.  At 100 TB the doc side stays a single
pass and the join build side is the eval set, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hash60, shingles

#: md5-prefix bucket space (15 hex chars = 60 bits, portable to DuckDB)
_BUCKETS = 16 ** 15


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    salt: str = "sample",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each doc of stratum s iff
    ``hash60(md5(salt:doc_id)) < fractions[s] * 16^15``.
    Strata absent from ``fractions`` are dropped (the sampleBy
    contract).  Changing ``salt`` draws an independent sample."""
    bucket = _hash60(F.concat(F.lit(salt + ":"),
                              F.col(id_col).cast("string")))
    frac = F.lit(None).cast("double")
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    return docs.where(
        frac.isNotNull()
        & (bucket < (frac * F.lit(float(_BUCKETS))).cast("long")))


def eval_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_hits, n_shingles, contamination) for every training doc
    sharing at least one word n-gram with the eval set.  ``contamination``
    = hit/total shingle ratio rounded to 6 dp (the rank/threshold key).
    The eval shingle set is deduped and broadcast."""
    train = shingles(docs, text_col=text_col, id_col=id_col, n=n)
    ev = (shingles(eval_docs, text_col=text_col, id_col=id_col, n=n)
          .select("shingle").distinct())
    hits = train.join(F.broadcast(ev), "shingle")
    return (hits.groupBy("doc_id", "n_sh")
            .agg(F.count("*").alias("n_hits"))
            .select("doc_id", "n_hits",
                    F.col("n_sh").alias("n_shingles"),
                    F.round(F.col("n_hits") / F.col("n_sh"), 6)
                    .alias("contamination")))
