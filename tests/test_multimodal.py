"""Multimodal plumbing tests: real schema/batching/explode paths, stubbed
codec (SURVEY.md §2.11 / task contract: decode is stubbed, plumbing real)."""

from __future__ import annotations

import pytest

from self_healing_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake payload bytes", (64, 48, None, None, "png")),
        (2, "image", b"", (0, 0, None, None, "png")),
        (3, "video", b"fake mp4", (640, 480, None, 3500, "mp4")),
        (4, "audio", b"\x00\x01\x02\x03" * 100, (None, None, 16000, 2000, "wav")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_raises(media):
    with pytest.raises(NotImplementedError):
        decode_image(b"anything")


def test_extract_features_schema_and_determinism(spark, media):
    out = extract_features(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,n_bytes:bigint,byte_entropy:double,"
        "feature:array<float>>"
    )
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 23
    assert rows[2]["feature"] == [0.0] * 8  # empty payload → zero vector
    assert abs(sum(rows[4]["feature"]) - 1.0) < 1e-6  # normalized histogram
    # deterministic across runs
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert again[1]["feature"] == rows[1]["feature"]


def test_frame_sample_plan_explodes_video_only(media):
    out = frame_sample_plan(media, every_ms=1000)
    rows = out.collect()
    assert {r["media_id"] for r in rows} == {3}
    assert sorted(r["frame_ts_ms"] for r in rows) == [0, 1000, 2000]
