"""Multimodal (image/audio/video) column handling for training-data
pipelines (north-star extension).

Design: media payloads are opaque ``binary`` columns + a typed metadata
struct; all per-item compute runs as Arrow-batched ``mapInPandas``
(payloads never pass through Python row-at-a-time serde, and the scan
stays embarrassingly parallel). Heavy rows are the scale hazard:
``repartition_for_media`` re-packs by payload size so one straggler
partition doesn't hold a 4 GB video while others hold thumbnails.

Codec status: heavyweight codecs (PIL/libav/ffmpeg) are NOT available
in this environment — ``decode_fn`` defaults to a clearly-marked
deterministic fake — but the seam is proven with REAL bytes by
``functions/codecs.py``: a pure-stdlib PNG encoder/decoder (zlib
inflate, CRC verification, all five scanline filters) whose
``png_decode_features`` plugs straight into
:func:`extract_media_features` and is oracle-gated end-to-end (q59
'png' arm). Swap in PIL/ffmpeg in production via the same signature.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def fake_decode_features(payload: bytes | None, kind: str, dim: int = 8) -> list[float]:
    """Deterministic STUB for the codec+featurizer step.

    Real deployments replace this with PIL/torchvision/librosa decode →
    embed. The fake derives ``dim`` floats from byte statistics so tests
    have stable, content-sensitive values.
    """
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    n = len(payload)
    return [
        float(sum(payload[i::dim]) % 1000) / 1000.0 for i in range(min(dim, n))
    ] + [0.0] * max(0, dim - n)


def repartition_for_media(
    media: DataFrame, target_bytes_per_partition: int = 512 * 1024 * 1024
) -> DataFrame:
    """Size-aware repartitioning: range-partition on a cumulative-size
    rank proxy (payload length) so partitions carry comparable byte
    loads — row-count partitioning is wrong when row sizes span 6
    orders of magnitude."""
    sized = media.withColumn("_sz", F.coalesce(F.length("payload"), F.lit(0)))
    total = sized.agg(F.sum("_sz").alias("t")).collect()[0]["t"] or 0
    n_parts = max(1, int(total / target_bytes_per_partition) + 1)
    return sized.repartitionByRange(n_parts, F.col("_sz"), F.col("media_id")).drop(
        "_sz"
    )


def extract_media_features(
    media: DataFrame,
    decode_fn: Callable[[bytes | None, str], list[float]] | None = None,
    dim: int = 8,
) -> DataFrame:
    """Decode/featurize every media row via Arrow-batched mapInPandas →
    FEATURE_RESULT_SCHEMA. ``decode_fn(payload, kind) -> list[float]``
    is the pluggable codec step (defaults to the deterministic stub)."""
    fn = decode_fn or (lambda p, k: fake_decode_features(p, k, dim))

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "feature": [
                        fn(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(_op, schema=FEATURE_RESULT_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic MEDIA_SCHEMA table derived from the ``documents``
    table (the container ships no real media): payload = UTF-8 bytes of
    the text, kind cycles image/audio/video by id, metadata derived
    from ``n_chars``. Every derived field is plain column math, so the
    downstream mapInPandas plumbing is DuckDB-oracle-checkable
    (n_bytes = octet_length(text), duration_ms = n_chars·13, …)."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") * 13).cast("long").alias("duration_ms"),
            F.lit(16_000).alias("sample_rate"),
        ).alias("meta"),
    )


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Resize plan for image rows → (media_id, width, height, payload).

    The output *geometry* (letterboxed target box preserving aspect
    ratio) is exact integer math on the metadata; the pixel resample is
    the stubbed codec step (real: PIL/torchvision inside the same
    mapInPandas). Geometry math runs in Python, on purpose — it must
    live next to the decoder that consumes it, and it is still
    oracle-checkable because it is deterministic integer arithmetic.
    """

    imgs = media.filter(F.col("kind") == "image").select(
        "media_id",
        F.coalesce(F.col("meta.width"), F.lit(0)).alias("_w"),
        F.coalesce(F.col("meta.height"), F.lit(0)).alias("_h"),
        "payload",
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w, out_h, payloads = [], [], []
            for w, h, p in zip(pdf["_w"], pdf["_h"], pdf["payload"]):
                if w <= 0 or h <= 0:
                    nw, nh = target_w, target_h
                else:
                    # fit inside the target box, preserve aspect ratio,
                    # never upscale
                    scale = min(target_w / w, target_h / h, 1.0)
                    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                out_w.append(nw)
                out_h.append(nh)
                # STUB resample: real impl decodes + resamples; the fake
                # keeps a deterministic prefix sized to the new geometry
                payloads.append(None if p is None else bytes(p[: nw * nh % 4096]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array(out_w, dtype="int32"),
                    "height": pd.array(out_h, dtype="int32"),
                    "payload": payloads,
                }
            )

    return imgs.mapInPandas(
        _resize, schema="media_id long, width int, height int, payload binary"
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame offset → (media_id, frame_idx, offset_ms, frame binary).

    The frame *schedule* is pure column math (explode over a sequence
    bounded by duration); the frame *extraction* is the stubbed decode
    step (real: ffmpeg seek per offset inside mapInPandas)."""
    vids = media.filter(F.col("kind") == "video")
    offsets = F.slice(
        F.sequence(
            F.lit(0),
            F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
            F.lit(every_ms),
        ),
        1,
        max_frames,
    )
    schedule = vids.select(
        "media_id", F.posexplode(offsets).alias("frame_idx", "offset_ms"), "payload"
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # STUB frame extraction: a real implementation seeks the
            # container; here a deterministic byte slice stands in.
            frames = [
                None if p is None else bytes(p[o % max(len(p), 1) : o % max(len(p), 1) + 16])
                for p, o in zip(pdf["payload"], pdf["offset_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "offset_ms": pdf["offset_ms"],
                    "frame": frames,
                }
            )

    return schedule.mapInPandas(
        _extract,
        schema="media_id long, frame_idx int, offset_ms long, frame binary",
    )
