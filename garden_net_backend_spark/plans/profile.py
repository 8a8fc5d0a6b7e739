"""Corpus profiling (north-star extension): the one-pass observability
job a pipeline runs before and after every curation step — token/char
distributions, language mix, quality mix, duplication rate — so a
100 TB ingest is steered by numbers, not vibes.

Everything reduces to driver-sized summaries in a SINGLE scan plus one
combinable aggregation per frame: the per-document metric columns are
the proven JVM-side expressions from ``functions/text.py`` (no UDFs),
quantiles use ``percentile_approx`` (GK sketch — mergeable, bounded
rank error; the q50 gate pins its envelope), and the duplicate rate
reuses the 128-bit content digest from exact dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import gopher_rules, lang_id, quality_score, token_count
from ..operators.dedup import normalize_text


def windowed_profile(
    docs: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """Per-ingest-window corpus health → one row per event-time window:
    ``(window_start, window_end, n_docs, n_tokens, mean_quality,
    gopher_keep_rate, approx_distinct_content)``.

    The SAME expression tree runs on a batch frame and on a stream
    (``readStream`` input gets a watermark and emits append-mode rows
    once windows close) — the engine-wide batch/stream equivalence
    discipline, so the live ingest monitor and the backfill report can
    never disagree. All aggregates are combinable (counts, decimal-
    bridge-free rounded means, HLL sketch), so state per open window is
    O(1).
    """
    g = gopher_rules(F.col(text_col))
    enriched = docs.select(
        F.col(ts_col),
        token_count(F.col(text_col)).alias("_ntok"),
        quality_score(F.col(text_col)).alias("_q"),
        g["keep"].cast("int").alias("_keep"),
        F.md5(normalize_text(F.col(text_col))).alias("_ck"),
    )
    if enriched.isStreaming:
        enriched = enriched.withWatermark(ts_col, watermark)
    return (
        enriched.groupBy(F.window(F.col(ts_col), window).alias("_w"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_ntok").alias("n_tokens"),
            F.round(F.avg("_q"), 6).alias("mean_quality"),
            F.round(F.avg("_keep"), 6).alias("gopher_keep_rate"),
            F.approx_count_distinct("_ck", 0.01).alias(
                "approx_distinct_content"
            ),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            "n_docs",
            "n_tokens",
            "mean_quality",
            "gopher_keep_rate",
            "approx_distinct_content",
        )
    )


def corpus_profile(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str | None = "source",
) -> dict[str, DataFrame]:
    """→ ``{"overall", "by_lang", "by_source"}`` summary frames (each
    driver-sized; ``by_source`` omitted when the column is absent).

    overall: doc count, token/char totals, token-count quantiles
    (p10/p50/p90/p99), mean quality, Gopher keep-rate, exact-duplicate
    rate (1 − distinct-content/docs — the fraction a dedup pass would
    remove).
    """
    g = gopher_rules(F.col(text_col))
    enriched = docs.select(
        F.col(text_col),
        *([F.col(source_col)] if source_col and source_col in docs.columns else []),
        token_count(F.col(text_col)).alias("_ntok"),
        F.length(text_col).alias("_nchar"),
        lang_id(F.col(text_col)).alias("_lang"),
        quality_score(F.col(text_col)).alias("_q"),
        g["keep"].cast("int").alias("_keep"),
        F.md5(normalize_text(F.col(text_col))).alias("_ck"),
    )
    overall = enriched.agg(
        F.count("*").alias("n_docs"),
        F.sum("_ntok").alias("n_tokens"),
        F.sum("_nchar").alias("n_chars"),
        F.percentile_approx(
            "_ntok", [0.1, 0.5, 0.9, 0.99], 10_000
        ).alias("token_quantiles"),
        F.round(F.avg("_q"), 6).alias("mean_quality"),
        F.round(F.avg("_keep"), 6).alias("gopher_keep_rate"),
        F.round(
            F.greatest(
                # HLL can overestimate distincts on an all-unique
                # corpus, pushing the rate a hair below zero — clamp
                F.lit(0.0),
                1 - F.approx_count_distinct("_ck", 0.01) / F.count("*"),
            ),
            6,
        ).alias("approx_dup_rate"),
    )
    by_lang = (
        enriched.groupBy(F.col("_lang").alias("lang"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_ntok").alias("n_tokens"),
            F.round(F.avg("_q"), 6).alias("mean_quality"),
        )
        .orderBy(F.desc("n_docs"))
    )
    out = {"overall": overall, "by_lang": by_lang}
    if source_col and source_col in docs.columns:
        out["by_source"] = (
            enriched.groupBy(F.col(source_col).alias("source"))
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("_ntok").alias("n_tokens"),
                F.round(F.avg("_keep"), 6).alias("gopher_keep_rate"),
            )
            .orderBy(F.desc("n_tokens"))
        )
    return out
