"""Streaming exact deduplication (north-star extension): a continuously
ingesting training-data pipeline must drop repeated documents online,
not in a nightly batch.

Built on ``dropDuplicatesWithinWatermark`` over the same normalized-
content key as ``operators/dedup.exact_dedup``: first arrival within
the watermark horizon wins; state for a key is dropped once the
watermark passes it, so state size is bounded by the unique-document
arrival rate × horizon — the property that makes this run forever at
ingest scale (a plain ``dropDuplicates`` on a stream keeps ALL keys in
state and grows without bound).

Semantics note: within-watermark dedup is exact for duplicates that
arrive inside the horizon and intentionally forgets older ones — a
re-crawl of a month-old page is dropped by the nightly batch pass
(``exact_dedup``), not the ingest stream. Batch mode applies the same
key and keeps min-id per key, so batch and stream agree on WHICH
content survives (key sets are equal; streams pick the first arrival,
batches the min id — both deterministic for their mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..operators.dedup import normalize_text


def content_key(text_col) -> F.Column:
    """128-bit normalized-content digest (md5 — engine-portable, and 16
    bytes of state/shuffle per key instead of the document body)."""
    return F.md5(normalize_text(text_col))


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen-wins exact dedup → input rows + ``content_key``,
    duplicates within the watermark horizon dropped.

    Streaming: ``withWatermark(ts) + dropDuplicatesWithinWatermark`` —
    bounded state, exactly-once per content key per horizon. Batch (the
    same call on a static frame): min-``id_col`` row per key via one
    window rank — the deterministic batch analogue (plain
    ``dropDuplicates`` keeps an arbitrary partition-order-dependent
    row, which would make batch output unstable across runs).
    """
    keyed = docs.withColumn("content_key", content_key(F.col(text_col)))
    if keyed.isStreaming:
        return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_key"]
        )
    w = W.partitionBy("content_key").orderBy(id_col)
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
