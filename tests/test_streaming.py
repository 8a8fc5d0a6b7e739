"""Structured Streaming tests: the windowed aggregations produce the
SAME result executed as a stream (file source, availableNow trigger,
memory sink) as in batch — plus watermark late-data behavior."""

import json
import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from garden_net_backend_spark.queries import _events
from garden_net_backend_spark.streaming.windows import (
    run_to_memory_sink,
    session_metrics,
    sliding_metrics,
    stream_events_json,
    tumbling_metrics,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_json_dir(spark):
    """Materialize the events table as a 4-file json dir (multiple files
    → multiple micro-batches under maxFilesPerTrigger)."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    ev = _events(spark, SF).orderBy("ts")
    rows = ev.collect()
    files = 4
    per = (len(rows) + files - 1) // files
    now = time.time()
    for i in range(files):
        with open(f"{d}/part{i}.json", "w") as fh:
            for r in rows[i * per : (i + 1) * per]:
                rec = r.asDict()
                rec["ts"] = rec["ts"].strftime("%Y-%m-%dT%H:%M:%S.%f")
                fh.write(json.dumps(rec) + "\n")
        # FileStreamSource orders candidate files by MODIFICATION TIME;
        # four files written back-to-back can land on the same mtime
        # tick, and a tie lets a chronologically-later file into an
        # earlier micro-batch — the sessionize equivalence tests then
        # flake with start>end sessions (seen once in a loaded full-
        # suite run). Pin strictly increasing mtimes so arrival order
        # is the chronological order the capped-session contract
        # assumes (the upload-queue shape: one file per trigger, in
        # order).
        os.utime(f"{d}/part{i}.json", (now - (files - i) * 10,) * 2)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch(spark):
    return _events(spark, SF)


def _norm(rows):
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize(
    "agg_fn,name",
    [
        (tumbling_metrics, "tumbling_sink"),
        (sliding_metrics, "sliding_sink"),
        (session_metrics, "session_sink"),
    ],
)
def test_stream_batch_equivalence(spark, events_json_dir, agg_fn, name):
    stream = stream_events_json(spark, events_json_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    run_to_memory_sink(agg_fn(stream), name, output_mode="complete")
    got = _norm(spark.sql(f"SELECT * FROM {name}").collect())
    want = _norm(agg_fn(_batch(spark)).collect())
    assert got == want


def test_watermark_drops_late_rows(spark):
    """Append-mode tumbling agg with a tight watermark: a straggler
    older than (max event time − watermark) is dropped from the stream
    result."""
    import os
    import time

    d = tempfile.mkdtemp(prefix="late_events_")
    try:
        batches = [
            # batch 0: establishes max event time 02:00 → watermark 01:50
            [
                {"event_id": 1, "ts": "2024-01-01T00:01:00.000000", "user_id": 1, "event_type": "a", "value": 1.0, "props": ""},
                {"event_id": 2, "ts": "2024-01-01T02:00:00.000000", "user_id": 1, "event_type": "a", "value": 1.0, "props": ""},
            ],
            # batch 1: advances processing → the [00:00,00:05) window is
            # finalized (end < watermark), emitted with n=1, state evicted
            [{"event_id": 4, "ts": "2024-01-01T02:01:00.000000", "user_id": 1, "event_type": "a", "value": 1.0, "props": ""}],
            # batch 2: straggler 2h behind the watermark → must be dropped
            # (dropping is only GUARANTEED once the window state is
            # evicted — a straggler arriving while state is still live
            # may legally merge, so the eviction batch above is essential)
            [{"event_id": 3, "ts": "2024-01-01T00:02:00.000000", "user_id": 1, "event_type": "a", "value": 1.0, "props": ""}],
        ]
        now = time.time()
        for i, recs in enumerate(batches):
            with open(f"{d}/{i}.json", "w") as fh:
                fh.write("\n".join(json.dumps(x) for x in recs))
            # file source orders micro-batches by modification time
            os.utime(f"{d}/{i}.json", (now - 120 + i * 60, now - 120 + i * 60))
        stream = stream_events_json(spark, d, max_files_per_trigger=1)
        agg = tumbling_metrics(stream, window="5 minutes", watermark="10 minutes")
        run_to_memory_sink(agg, "late_sink", output_mode="append")
        rows = [
            (r["window_start"], r["n"])
            for r in spark.sql("SELECT * FROM late_sink").collect()
        ]
        # exactly one finalized emission of the 00:00 window, straggler
        # excluded and no duplicate window row afterwards
        assert rows.count(("2024-01-01 00:00:00", 1)) == 1
        assert ("2024-01-01 00:00:00", 2) not in rows
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_capped_sessionize_stream_matches_batch(spark, events_json_dir):
    """Custom stateful operator (applyInPandasWithState): every emitted
    session must be exactly a batch-form session; the only sessions
    allowed to be missing are each user's final one when it is neither
    cap-filled nor yet timed out (still legitimately open at
    end-of-stream)."""
    from garden_net_backend_spark.streaming.stateful import (
        capped_sessionize,
        capped_sessionize_stream,
    )

    MAX_EVENTS = 2

    def key(r):
        return (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            round(r["total_value"], 6),
        )

    stream = stream_events_json(spark, events_json_dir, max_files_per_trigger=1)
    run_to_memory_sink(
        capped_sessionize_stream(stream, max_events=MAX_EVENTS),
        "stateful_sessions",
        output_mode="append",
    )
    got = {key(r) for r in spark.sql("SELECT * FROM stateful_sessions").collect()}
    batch_rows = capped_sessionize(_batch(spark), max_events=MAX_EVENTS).collect()
    want = {key(r) for r in batch_rows}

    assert got, "stream emitted nothing"
    assert got <= want, f"stream emitted non-batch sessions: {sorted(got - want)[:3]}"
    # missing ⊆ {per-user final session with n < cap}
    last_per_user = {}
    for r in batch_rows:
        cur = last_per_user.get(r["user_id"])
        if cur is None or r["session_start"] > cur["session_start"]:
            last_per_user[r["user_id"]] = r
    open_allowed = {
        key(r) for r in last_per_user.values() if r["n_events"] < MAX_EVENTS
    }
    missing = want - got
    assert missing <= open_allowed, f"closed sessions missing: {sorted(missing - open_allowed)[:3]}"


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas drives its state server over "
    "protobuf; neither the real 'protobuf' package nor the vendored "
    "wire-format shim (conftest activates it) is importable",
)
def test_capped_sessionize_tws_matches_batch(spark, events_json_dir):
    """transformWithStateInPandas variant (typed ValueState + explicit
    event-time timers, RocksDB state store): same containment contract
    as the applyInPandasWithState form — emitted ⊆ batch sessions,
    missing ⊆ still-open finals."""
    from garden_net_backend_spark.streaming.stateful import (
        capped_sessionize,
        capped_sessionize_tws,
    )

    MAX_EVENTS = 2

    def key(r):
        return (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            round(r["total_value"], 6),
        )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = stream_events_json(spark, events_json_dir, max_files_per_trigger=1)
        run_to_memory_sink(
            capped_sessionize_tws(stream, max_events=MAX_EVENTS),
            "tws_sessions",
            output_mode="append",
        )
        got = {key(r) for r in spark.sql("SELECT * FROM tws_sessions").collect()}
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    batch_rows = capped_sessionize(_batch(spark), max_events=MAX_EVENTS).collect()
    want = {key(r) for r in batch_rows}

    assert got, "tws stream emitted nothing"
    assert got <= want, f"tws emitted non-batch sessions: {sorted(got - want)[:3]}"
    last_per_user = {}
    for r in batch_rows:
        cur = last_per_user.get(r["user_id"])
        if cur is None or r["session_start"] > cur["session_start"]:
            last_per_user[r["user_id"]] = r
    open_allowed = {
        key(r) for r in last_per_user.values() if r["n_events"] < MAX_EVENTS
    }
    missing = want - got
    assert missing <= open_allowed, f"closed sessions missing: {sorted(missing - open_allowed)[:3]}"


# ---------------------------------------------------------------------
# Streaming exact dedup (streaming/dedup.py)
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def dup_docs_dir(spark):
    """3 json files (micro-batches under maxFilesPerTrigger=1) with
    duplicates WITHIN and ACROSS batches."""
    import tempfile

    d = tempfile.mkdtemp(prefix="dedup_stream_")
    batches = [
        [
            {"doc_id": 0, "text": "Alpha  Beta", "ts": "2024-01-01T10:00:00.000"},
            {"doc_id": 1, "text": "alpha beta", "ts": "2024-01-01T10:00:10.000"},
            {"doc_id": 2, "text": "unique one", "ts": "2024-01-01T10:00:20.000"},
        ],
        [
            {"doc_id": 3, "text": "ALPHA BETA", "ts": "2024-01-01T10:05:00.000"},
            {"doc_id": 4, "text": "another doc", "ts": "2024-01-01T10:05:10.000"},
        ],
        [
            {"doc_id": 5, "text": "unique one", "ts": "2024-01-01T10:10:00.000"},
            {"doc_id": 6, "text": "fresh text", "ts": "2024-01-01T10:10:10.000"},
        ],
    ]
    for i, rows in enumerate(batches):
        with open(f"{d}/part{i}.json", "w") as fh:
            for rec in rows:
                fh.write(json.dumps(rec) + "\n")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_dedup_stream_drops_cross_batch_duplicates(spark, dup_docs_dir):
    from garden_net_backend_spark.streaming.dedup import dedup_stream

    schema = "doc_id long, text string, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(dup_docs_dir)
    )
    out = dedup_stream(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM dedup_sink").collect()
    kept_ids = {r["doc_id"] for r in rows}
    # one survivor per normalized content: alpha-beta trio → one of
    # {0,1,3}; "unique one" pair → one of {2,5}; singletons kept
    assert len(kept_ids & {0, 1, 3}) == 1
    assert len(kept_ids & {2, 5}) == 1
    assert {4, 6} <= kept_ids
    assert len(rows) == 4

    # batch mode on the same data: same surviving CONTENT (key sets
    # equal), min-id winner per key
    batch = spark.read.schema(schema).json(dup_docs_dir)
    bout = dedup_stream(batch)
    bkeys = {r["content_key"] for r in bout.collect()}
    assert bkeys == {r["content_key"] for r in rows}
    bids = {r["doc_id"] for r in bout.collect()}
    assert bids == {0, 2, 4, 6}  # min id per duplicate group
