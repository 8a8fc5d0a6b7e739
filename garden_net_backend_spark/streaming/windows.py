"""Structured Streaming operators over the events stream.

The reference has no streaming (SURVEY.md §2.9) — its closest analogue
is the per-upload feature recomputation job. The engine's streaming
surface: event-time windowed aggregations (tumbling / sliding /
session) with watermark-based late-data handling. Each aggregation is
the SAME DataFrame expression as its batch catalog query
(queries.py q39-q41) — one definition, two execution modes; tests pin
batch/stream equivalence via the availableNow trigger.

At scale: watermark bounds state; the shuffle key is (window,
group-key) which AQE handles like any agg; sinks should partition by
window date for pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events_json(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events (json lines). The declared schema is
    mandatory for streams — no inference race."""
    reader = spark.readStream.schema(EVENTS_JSON_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def tumbling_metrics(
    events: DataFrame, window: str = "5 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window count+sum per event type. On a stream the
    watermark lets Spark finalize windows ``watermark`` behind the max
    seen event time and drop later stragglers; on a batch DataFrame
    withWatermark is a no-op, so the same function serves both modes."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,8)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_metrics(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,8)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "sum_value",
        )
    )


def session_metrics(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "60 minutes"
) -> DataFrame:
    """Session windows (gap-based) per user. Streaming session windows
    REQUIRE a watermark (unbounded state otherwise)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain an availableNow stream into an in-memory table named
    ``query_name`` (test/demo sink)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
