"""Streaming exact dedup: first occurrence wins ACROSS micro-batches
(state store holds fingerprints, not text), normalization agrees with
the batch exact-dedup key, and key_cols scope the identity."""

from __future__ import annotations

from lucenenet_spark.streaming.dedup_stream import (content_fingerprint,
                                                    streaming_exact_dedup)


def _run_stream(spark, tmp_path, batches, name, **kwargs):
    src = tmp_path / "in"
    src.mkdir()
    schema = None
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string, src string")
        schema = df.schema
        df.write.parquet(str(src / f"w{i}"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "w*")))
    out = streaming_exact_dedup(stream, "text", **kwargs)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_first_occurrence_wins_across_batches(spark, tmp_path):
    rows = _run_stream(spark, tmp_path, [
        [(0, "alpha beta", "a"), (1, "gamma delta", "a")],
        [(2, "alpha  BETA", "b"),   # dup of 0 after normalization
         (3, "epsilon zeta", "b")],
    ], name="dd_out")
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == [0, 1, 3]
    # the fingerprint working column does not leak into the output
    assert set(rows[0].asDict()) == {"doc_id", "text", "src"}


def test_key_cols_scope_identity(spark, tmp_path):
    """Same text under DIFFERENT key_cols values is NOT a duplicate
    (per-source dedup, the multi-tenant ingest shape)."""
    rows = _run_stream(spark, tmp_path, [
        [(0, "alpha beta", "a")],
        [(1, "alpha beta", "b"), (2, "alpha beta", "a")],
    ], name="dd_keyed", key_cols=("src",))
    assert sorted(r["doc_id"] for r in rows) == [0, 1]


def test_fingerprint_matches_batch_normalization(spark):
    df = spark.createDataFrame(
        [("Alpha\t Beta ",), ("alpha beta",)], "t string")
    fps = [r["fp"] for r in
           df.select(content_fingerprint(df.t).alias("fp")).collect()]
    assert fps[0] != fps[1]  # trailing space survives collapse-to-one
    df2 = spark.createDataFrame([("Alpha\t Beta",), ("alpha beta",)],
                                "t string")
    fps2 = [r["fp"] for r in
            df2.select(content_fingerprint(df2.t).alias("fp")).collect()]
    assert fps2[0] == fps2[1]
