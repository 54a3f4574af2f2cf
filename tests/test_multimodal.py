"""Multimodal plumbing tests: the Spark-side contracts are real even though
the codec kernels are deterministic fakes."""

from __future__ import annotations

import hashlib

import pytest

from autonomous_orchestrator_ai_spark.operators.multimodal import (
    extract_features,
    repartition_for_decode,
    resize_stub,
    sample_frames,
    synthetic_media,
)


@pytest.fixture()
def media(spark):
    return synthetic_media(spark, n=16)


def test_extract_features_schema_and_determinism(media):
    out = extract_features(media, dim=8)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,n_bytes:bigint,content_sha256:string,"
        "features:array<float>>"
    )
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 16
    blob = bytes((hashlib.md5(b"42:0").digest() * 16))[:128]
    assert rows[0]["content_sha256"] == hashlib.sha256(blob).hexdigest()
    assert rows[0]["n_bytes"] == 128
    assert len(rows[0]["features"]) == 8
    assert all(0.0 <= f < 1.0 for f in rows[0]["features"])
    # deterministic across runs
    again = {r["media_id"]: r["content_sha256"] for r in extract_features(media).collect()}
    assert again[5] == rows[5]["content_sha256"]


def test_extract_features_after_repartition(media):
    out = extract_features(repartition_for_decode(media, 4))
    assert out.count() == 16


def test_sample_frames_fanout(media):
    frames = sample_frames(media, every_n_bytes=64, max_frames=4)
    per_media = {r["media_id"]: r for r in frames.filter("frame_index = 0").collect()}
    assert len(per_media) == 16          # every media yields >=1 frame
    counts = frames.groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in counts)
    # frame bytes really are slices of the blob
    blob = bytes((hashlib.md5(b"42:1").digest() * 16))[: 128 + 64]
    got = sorted(
        (r["frame_index"], bytes(r["frame"]))
        for r in frames.filter("media_id = 1").collect()
    )
    assert got[0][1] == blob[:64] and got[1][1] == blob[64:128]


def test_resize_updates_meta_only(media):
    out = resize_stub(media, 224, 224)
    row = out.filter("media_id = 0").collect()[0]
    assert row["meta"]["width"] == 224 and row["meta"]["height"] == 224
    assert row["meta"]["mime"] == "image/fake"


def test_real_codecs_clearly_stubbed(media):
    with pytest.raises(NotImplementedError):
        extract_features(media, use_real_codecs=True)
    with pytest.raises(NotImplementedError):
        sample_frames(media, use_real_codecs=True)
