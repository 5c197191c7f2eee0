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
