"""CheckIndex invariants: clean on a healthy index, dirty on corruption.

Mirrors test/Lucene.Net.Test/Index/TestCheckIndex.cs behaviorally."""

from __future__ import annotations

import numpy as np
import pytest

from lucenenet_spark.index import codec
from lucenenet_spark.index.checkindex import check_index


@pytest.fixture(scope="module")
def seg_index(spark):
    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

    docs = with_doc_ids(corpus_df(spark, 200, partitions=4),
                        ("repo", "path")).cache()
    return build_segmented_index(spark, docs, text_col="content",
                                 lang_col="lang", target_segments=2)


def test_clean_index_passes(spark, seg_index):
    report = check_index(seg_index, source=seg_index.stored)
    assert report["clean"], report["issues"][:5]
    assert report["n_segments"] == 2
    assert report["sha_rollup_match"]


def test_corruption_detected(spark, seg_index):
    import pyspark.sql.functions as F
    from lucenenet_spark.index.segments import SegmentedIndex

    # corrupt one row's df metadata
    bad = seg_index.segments.withColumn(
        "df",
        F.when(F.col("term") == "index", F.col("df") + 1).otherwise(F.col("df")),
    )
    broken = SegmentedIndex(
        spark=spark, segments=bad, stats=seg_index.stats,
        stored=seg_index.stored, id_col=seg_index.id_col,
        fields=seg_index.fields)
    report = check_index(broken)
    assert not report["clean"]
    assert any("I2" in i[3] for i in report["issues"])


def test_unsorted_docids_detected():
    # codec-level: hand-build a decreasing docID list and check I1 logic
    docs = np.array([5, 3, 1])
    tfs = np.array([1, 1, 1])
    dls = np.array([4, 4, 4])
    enc = codec.encode_postings(docs, tfs, dls)
    d, _, _, _ = codec.decode_postings(
        enc["docs_blob"], enc["tfs_blob"], enc["dls_blob"])
    # delta encoding of unsorted input round-trips wrapped (uint underflow),
    # so the ascending invariant is exactly what catches it
    assert not (np.diff(d) > 0).all() or not (d == docs).all()


def test_i10_mixed_payload_coverage_flagged(spark):
    """add_indexes of a payload-carrying index with a plain one leaves a
    term with heterogeneous pay_blob coverage; CheckIndex I10 flags it
    (the next merge of that term would silently drop its payloads —
    codec.merge_postings emits a RuntimeWarning when it actually does)."""
    import warnings

    import pytest as _pytest
    from pyspark.sql import functions as F

    from lucenenet_spark.analysis.payloads import delimited_payload_analyzer
    from lucenenet_spark.index import codec
    from lucenenet_spark.index.checkindex import check_index
    from lucenenet_spark.index.segments import (
        add_indexes, build_segmented_index)

    plain = build_segmented_index(
        spark, spark.createDataFrame([(0, "alpha beta")],
                                     "doc_id long, text string"),
        text_col="text", id_col="doc_id", field_name="text")
    pay = build_segmented_index(
        spark, spark.createDataFrame([(10, "alpha|1.5 beta|2.0")],
                                     "doc_id long, text string"),
        text_col="text", id_col="doc_id", field_name="text",
        analyzer=delimited_payload_analyzer())
    both = add_indexes(plain, pay)
    rep = check_index(both)
    assert any("I10" in i[3] for i in rep["issues"]), rep["issues"]
    # each source index alone is homogeneous: no I10
    assert not any("I10" in i[3] for i in check_index(pay)["issues"])

    # the degrade itself warns
    parts = [{"docs_blob": bytes(r["docs_blob"]),
              "tfs_blob": bytes(r["tfs_blob"]),
              "dls_blob": bytes(r["dls_blob"]),
              "pos_blob": bytes(r["pos_blob"]) if r["pos_blob"] else b"",
              "pay_blob": bytes(r["pay_blob"]) if r["pay_blob"] else b""}
             for r in both.segments.where(F.col("term") == "alpha")
             .collect()]
    with _pytest.warns(RuntimeWarning, match="discarding payloads"):
        warnings.simplefilter("always")
        merged = codec.merge_postings(parts)
    assert merged["pay_blob"] == b""
