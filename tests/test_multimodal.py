"""Multimodal plumbing: typed schemas, Arrow batch shapes, deterministic
fake decode (the codec itself is stubbed — no image/audio libs in the
container), and the real-decoder hook's absence path."""

import hashlib

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def payloads(spark):
    docs = spark.createDataFrame(
        [(i, f"document body {i} " * (i + 1)) for i in range(12)],
        "doc_id long, text string")
    return mm.synthesize_payloads(docs).cache()


def test_payload_schema_and_modalities(payloads):
    assert [f.name for f in payloads.schema.fields] == [
        "id", "modality", "mime", "payload"]
    assert payloads.schema["payload"].dataType.typeName() == "binary"
    mods = {r["id"] % 3: r["modality"] for r in payloads.collect()}
    assert mods == {0: "image", 1: "audio", 2: "video"}


def test_decode_meta_typed_fields(payloads):
    rows = {r["id"]: r for r in mm.decode_meta(payloads).collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        text = f"document body {i} " * (i + 1)
        data = text.encode()
        assert r["byte_len"] == len(data)
        assert r["payload_sha"] == hashlib.sha256(data).hexdigest()
        if r["modality"] == "audio":
            assert r["width"] is None and r["sample_rate"] is not None
            assert 8000 <= r["sample_rate"] <= 40000
        else:
            assert 64 <= r["width"] <= 64 + 4031
        if r["modality"] == "image":
            assert r["duration_ms"] is None
        else:
            assert 1000 <= r["duration_ms"] <= 601000


def test_image_features_shape_and_determinism(payloads):
    f1 = {r["id"]: r["feat"] for r in mm.image_features(payloads).collect()}
    f2 = {r["id"]: r["feat"] for r in mm.image_features(payloads).collect()}
    assert set(f1) == {0, 3, 6, 9}  # image modality only
    assert f1 == f2
    for v in f1.values():
        assert len(v) == 16 and all(0.0 <= x < 1.0 for x in v)


def test_frame_sample_bounded_and_keyed(payloads):
    fr = mm.frame_sample(payloads, every_ms=10000, max_frames=16)
    rows = fr.collect()
    ids = {r["id"] for r in rows}
    assert ids <= {2, 5, 8, 11}  # video modality only
    per = {}
    for r in rows:
        per.setdefault(r["id"], []).append(r["frame_idx"])
    for vid, idxs in per.items():
        assert sorted(idxs) == list(range(len(idxs)))
        assert 1 <= len(idxs) <= 16


def test_real_decoder_hook_absent():
    # PIL is not installed in this container: the hook must return None
    # (fake path) rather than raising.
    assert mm._try_real_image_decode(b"\xff\xd8\xff") is None


def test_partitioning_invariance(spark, payloads):
    a = sorted(map(tuple, mm.decode_meta(payloads).collect()))
    b = sorted(map(tuple,
                   mm.decode_meta(payloads.repartition(7)).collect()))
    assert a == b
