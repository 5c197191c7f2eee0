"""Streaming exact dedup — cross-micro-batch duplicate suppression at
ingest (the streaming face of operators/dedup.exact_dedup and of the
reference's DuplicateFilter, src/contrib/Queries/DuplicateFilter.cs,
which keeps the FIRST doc per key at query time).

Spark-first: the state store behind ``dropDuplicates`` IS the dedup
index — no custom stateful UDF needed.  Keys are a content fingerprint
(sha2 over the normalized text, optionally a key-column tuple), so the
state per seen document is one small hash row, not the text.  With a
watermark + event-time column the state is bounded (Spark drops
fingerprints older than the horizon — "exactly-once within the
watermark" semantics, the standard production trade); without one the
state grows with distinct keys, which is what ``dropDuplicates`` itself
documents, and is fine for bounded replay/backfill streams.

    stream = spark.readStream.schema(s).parquet(src)
    deduped = streaming_exact_dedup(stream, "text")
    deduped.writeStream...  # first occurrence of each text survives
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fingerprint column added to the stream
FP_COL = "_dedup_fp"


def content_fingerprint(text: Column, *, normalize: bool = True) -> Column:
    """sha2-256 of the (optionally whitespace/case-normalized) content —
    the same exact-dup key family operators/dedup.exact_dedup groups on;
    normalization mirrors its key_chars prep (lower + collapsed
    whitespace) so batch and streaming agree on what "exact" means."""
    t = text
    if normalize:
        t = F.regexp_replace(F.lower(t), r"\s+", " ")
    return F.sha2(t, 256)


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    key_cols: tuple[str, ...] = (),
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
    normalize: bool = True,
) -> DataFrame:
    """First-occurrence-wins exact dedup over a structured stream.

    key = (key_cols..., fingerprint(text)); with ``event_time_col`` the
    stream is watermarked and ``dropDuplicatesWithinWatermark`` bounds
    the state store; without one, plain ``dropDuplicates`` keeps all
    seen fingerprints (unbounded-key caveat documented above)."""
    out = stream.withColumn(
        FP_COL, content_fingerprint(F.col(text_col), normalize=normalize))
    keys = [*key_cols, FP_COL]
    if event_time_col is not None:
        out = out.withWatermark(event_time_col, watermark)
        out = out.dropDuplicatesWithinWatermark(keys)
    else:
        out = out.dropDuplicates(keys)
    return out.drop(FP_COL)
