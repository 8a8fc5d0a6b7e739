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


def test_resize_geometry(media):
    from garden_net_backend_spark.operators.multimodal import resize_images

    out = {r["media_id"]: r for r in resize_images(media, 224, 224).collect()}
    # only image rows
    assert set(out) == {1, 4}
    # 16x16 must NOT be upscaled
    assert (out[1]["width"], out[1]["height"]) == (16, 16)
    # 1x1 stays 1x1 (never upscale, floor at 1)
    assert (out[4]["width"], out[4]["height"]) == (1, 1)
    assert out[4]["payload"] is None  # null payload passes through


def test_resize_downscale_aspect(spark):
    from garden_net_backend_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    rows = [
        (10, "image", b"x" * 100, ("image/png", 1920, 1080, None, None)),
        (11, "image", b"x" * 100, ("image/png", 0, 0, None, None)),  # no dims
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(df, 224, 224).collect()}
    # 1920x1080: scale = min(224/1920, 224/1080, 1) = 224/1920
    assert (out[10]["width"], out[10]["height"]) == (224, int(1080 * 224 / 1920))
    # unknown dims → target box
    assert (out[11]["width"], out[11]["height"]) == (224, 224)


def test_synthesized_media_round_trip(spark):
    from garden_net_backend_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media_from_documents,
    )

    docs = spark.createDataFrame(
        [(0, "hello world", "en", "s", 11), (2, "abc", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    media = synthesize_media_from_documents(docs)
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[0]["kind"] == "image" and rows[2]["kind"] == "video"
    assert bytes(rows[0]["payload"]) == b"hello world"
    assert rows[2]["meta"]["duration_ms"] == 39
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert feats[0]["n_bytes"] == 11


# ---------------------------------------------------------------------
# Real pure-stdlib PNG codec (functions/codecs.py)
# ---------------------------------------------------------------------


def test_png_round_trip_all_color_types():
    from garden_net_backend_spark.functions.codecs import decode_png, encode_png

    import random

    rng = random.Random(11)
    # heights >= 5 so the cycling encoder exercises every filter type
    for w, h, ct in [(1, 5, 0), (7, 6, 0), (8, 5, 2), (5, 7, 6)]:
        ch = {0: 1, 2: 3, 6: 4}[ct]
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        assert decode_png(encode_png(w, h, px, ct)) == (w, h, ch, px)


def test_png_rejects_garbage_and_corruption():
    from garden_net_backend_spark.functions.codecs import decode_png, encode_png

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a not a png")
    good = encode_png(2, 2, bytes(range(4)), 0)
    # flip one IDAT byte → CRC check must catch it
    bad = bytearray(good)
    bad[len(good) - 20] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_png_rejects_unsupported_subset():
    from garden_net_backend_spark.functions.codecs import decode_png

    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # 16-bit depth is outside the declared subset → fail loud
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    payload = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(payload)


def test_png_decode_features_contract():
    from garden_net_backend_spark.functions.codecs import (
        encode_png,
        png_decode_features,
    )

    px = bytes((7 + x + y) % 256 for y in range(4) for x in range(6))
    feats = png_decode_features(encode_png(6, 4, px, 0), "image")
    assert feats[:3] == [6.0, 4.0, 1.0]
    assert feats[3] == float(sum(px))
    assert feats[4] == float(min(px)) and feats[5] == float(max(px))
    assert png_decode_features(None, "image") == [0.0] * 8


def test_wav_round_trip_and_rejection():
    from garden_net_backend_spark.functions.codecs import (
        decode_wav,
        encode_wav,
        wav_decode_features,
    )

    samples = [0, 100, -100, 32767, -32768, 5]
    rate, got = decode_wav(encode_wav(samples, sample_rate=8000))
    assert rate == 8000 and got == samples
    # odd-sized extra chunk before fmt: chunk walk + word alignment
    import struct

    wav = encode_wav(samples)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    patched = wav[:12] + extra + wav[12:]
    rate2, got2 = decode_wav(patched)
    assert (rate2, got2) == (16000, samples)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    # stereo is outside the declared subset
    stereo = bytearray(wav)
    stereo[22] = 2  # channel count field
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(stereo))
    feats = wav_decode_features(wav, "audio")
    assert feats[0] == 16000.0 and feats[1] == 6.0
    assert feats[3] == float(sum(samples))
    assert feats[4] == -32768.0 and feats[5] == 32767.0
