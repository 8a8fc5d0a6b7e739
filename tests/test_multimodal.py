"""Multimodal plumbing tests: schema, Arrow batch shapes, frame
schedules, size-aware partitioning (decode itself is a documented stub)."""

import pytest

from garden_net_backend_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    repartition_for_media,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytes(range(256)) * 4, ("image/png", 16, 16, None, None)),
        (2, "audio", b"\x01\x02" * 1000, ("audio/wav", None, None, 2000, 16000)),
        (3, "video", bytes(range(200)) * 50, ("video/mp4", 320, 240, 5500, None)),
        (4, "image", None, ("image/png", 1, 1, None, None)),  # null payload
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_batched(media):
    out = extract_media_features(media, dim=8)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1]["n_bytes"] == 1024
    assert rows[4]["n_bytes"] == 0
    assert len(rows[1]["feature"]) == 8
    assert rows[4]["feature"] == [0.0] * 8  # null payload → zero vector
    # deterministic (stub is content-derived)
    again = {r["media_id"]: r for r in extract_media_features(media, dim=8).collect()}
    assert rows[1]["feature"] == again[1]["feature"]


def test_custom_decode_fn_contract(media):
    def decoder(payload, kind):
        # encode both args into the output so the test can observe what
        # the executor-side UDF received (driver-side capture won't work)
        return [
            float(0 if payload is None else len(payload)),
            float(len(kind)),
        ]

    out = {
        r["media_id"]: r["feature"]
        for r in extract_media_features(media, decode_fn=decoder).collect()
    }
    assert out[2] == [2000.0, 5.0]  # audio payload len, len("audio")
    assert out[3][1] == 5.0  # len("video")
    assert out[4] == [0.0, 5.0]  # null payload, len("image")


def test_video_frame_schedule(media):
    frames = sample_video_frames(media, every_ms=1000, max_frames=16).collect()
    # only the video row; 5500ms at 1000ms steps → offsets 0..5000 = 6
    assert {r["media_id"] for r in frames} == {3}
    assert [r["offset_ms"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [
        0, 1000, 2000, 3000, 4000, 5000,
    ]
    assert all(r["frame"] is not None for r in frames)


def test_size_aware_repartition(media):
    out = repartition_for_media(media, target_bytes_per_partition=4096)
    assert out.count() == 4
    assert set(out.columns) == set(media.columns)
