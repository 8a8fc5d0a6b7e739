"""Custom stateful streaming operator: capped sessionization via
``applyInPandasWithState`` (SURVEY.md §2.9 extension — the reference has
no streaming; this demonstrates the arbitrary-stateful surface that
``F.session_window`` cannot express).

Semantics (one definition, two execution modes):

  A session is a maximal run of one user's events ordered by
  ``(ts, event_id)`` in which consecutive events are ≤ ``gap`` apart
  AND the run holds at most ``max_events`` events. The
  ``max_events+1``-th event starts a NEW session even with no time gap
  — a per-group, iteration-order-dependent cut that needs real state,
  which is exactly what ``applyInPandasWithState`` provides.

- Batch form: :func:`capped_sessionize` — gaps-and-islands (lag → gap
  flag → running sum = session id) then chunking by event index within
  the island. Pure window functions, whole-stage-codegen, shuffle keyed
  on ``user_id`` only. Oracle-gated as catalog query q58.
- Streaming form: :func:`capped_sessionize_stream` — per-user
  ``GroupState`` carrying (start, last, n, value-sum). Sessions are
  emitted when CLOSED: immediately when the count cap fills (no future
  event can extend it), on arrival of an out-of-gap event, or on
  event-time state timeout once the watermark passes ``last + gap``
  (so state is bounded — the 100 TB requirement: state size is
  O(active users), not O(events)).

Equivalence of the two forms is pinned in tests/test_streaming.py.

Scale notes: the shuffle key is ``user_id`` (AQE handles skew); Arrow
batches flow per user-group; state store is RocksDB-backed in
production configs; watermark bounds both late data and state
lifetime.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.exact import dsum

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
# state: epoch-µs start/last, event count, running value sum
_STATE_SCHEMA = "start long, last long, n long, sv double"


def capped_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    max_events: int = 2,
    value_col: str = "value",
) -> DataFrame:
    """Batch form → (user_id, session_start, session_end, n_events,
    total_value); total_value uses the exact-decimal sum so the DuckDB
    oracle hash-matches."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us: Column = F.unix_micros(F.col("ts"))
    new_sess = (
        F.when(us - F.lag(us).over(w) <= gap_us, F.lit(0)).otherwise(F.lit(1))
    )
    with_sid = events.withColumn("_new", new_sess).withColumn(
        "_sid", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    wc = W.partitionBy("user_id", "_sid").orderBy("ts", "event_id")
    chunked = with_sid.withColumn(
        "_sub", F.floor((F.row_number().over(wc) - 1) / max_events)
    )
    return chunked.groupBy("user_id", "_sid", "_sub").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        dsum(F.col(value_col)).alias("total_value"),
    ).drop("_sid", "_sub")


def capped_sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    max_events: int = 2,
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming form over a streaming events DataFrame (must carry
    ``ts``/``event_id``/``user_id``/``value_col``). Emits closed
    sessions; open state expires (and emits) via event-time timeout at
    ``last + gap`` once the watermark passes it."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def _fold(
        key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState
    ) -> Iterable["pd.DataFrame"]:
        (user_id,) = key
        closed: list[tuple] = []

        def emit(start: int, last: int, n: int, sv: float) -> None:
            closed.append((user_id, start, last, n, sv))

        if state.hasTimedOut:
            start, last, n, sv = state.get
            emit(start, last, n, sv)
            state.remove()
        else:
            cur = state.get if state.exists else None
            rows = pd.concat(list(pdfs))
            rows = rows.sort_values(["ts", "event_id"])
            ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()
            vals = rows[value_col].to_numpy()
            for t, v in zip(ts_us, vals):
                # native python types: GroupState round-trips through
                # JSON, which rejects numpy scalars
                t = int(t)
                v = float(v) if v == v else 0.0  # NaN-safe like SUM
                if cur is not None:
                    start, last, n, sv = cur
                    if t - last <= gap_us and n < max_events:
                        cur = (start, t, n + 1, sv + v)
                    else:
                        emit(start, last, n, sv)
                        cur = (t, t, 1, v)
                else:
                    cur = (t, t, 1, v)
                # cap filled → no future event can extend: final now
                if cur[2] == max_events:
                    emit(*cur)
                    cur = None
            if cur is None:
                if state.exists:
                    state.remove()
            else:
                state.update(cur)
                # event-time timeout: fires when watermark > last + gap
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        out = pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _fold,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def capped_sessionize_tws(
    events: DataFrame,
    gap_minutes: int = 30,
    max_events: int = 2,
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Same capped-sessionization semantics on the Spark 4
    ``transformWithStateInPandas`` API (the successor to
    ``applyInPandasWithState``): typed ``ValueState`` + explicit
    event-time timers instead of a single state tuple + timeout conf.

    Differences that matter operationally: state is Arrow-encoded (no
    JSON round-trip, numpy scalars fine), multiple named state
    variables/TTL are available, and timers are first-class (register/
    delete per key). Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) and a ``google.protobuf``
    runtime (the TWS state server speaks protobuf): in containers
    without the real package the vendored minimal wire-format shim
    (``garden_net_backend_spark/_vendor/protoshim``) satisfies the
    import, and the batch-equivalence test runs for real (it was
    skipped through round 3)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_minutes * 60 * 1_000_000
    cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]

    def _out(closed: list[tuple]):
        out = pd.DataFrame(closed, columns=cols)
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        return out

    class _CappedSession(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            # state schema also carries the registered timer (ms) so we
            # can delete/re-register as the session extends
            self._sess = handle.getValueState(
                "sess", "start long, last long, n long, sv double, tmr long"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            closed: list[tuple] = []
            st = self._sess.get() if self._sess.exists() else None
            cur = None if st is None else (int(st[0]), int(st[1]), int(st[2]), float(st[3]))
            old_tmr = None if st is None else int(st[4])
            pdfs = [p for p in rows if len(p)]
            if pdfs:
                allr = pd.concat(pdfs).sort_values(["ts", "event_id"])
                ts_us = (allr["ts"].astype("int64") // 1000).to_numpy()
                vals = allr[value_col].to_numpy()
                for t, v in zip(ts_us, vals):
                    t = int(t)
                    v = float(v) if v == v else 0.0
                    if cur is not None:
                        start, last, n, sv = cur
                        if t - last <= gap_us and n < max_events:
                            cur = (start, t, n + 1, sv + v)
                        else:
                            closed.append((user_id, start, last, n, sv))
                            cur = (t, t, 1, v)
                    else:
                        cur = (t, t, 1, v)
                    if cur[2] == max_events:
                        closed.append((user_id, *cur))
                        cur = None
            if old_tmr is not None:
                self._handle.deleteTimer(old_tmr)
            if cur is None:
                if self._sess.exists():
                    self._sess.clear()
            else:
                tmr = (cur[1] + gap_us) // 1000
                self._sess.update((*cur, tmr))
                self._handle.registerTimer(tmr)
            if closed:
                yield _out(closed)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if self._sess.exists():
                start, last, n, sv, _ = self._sess.get()
                self._sess.clear()
                yield _out([(user_id, int(start), int(last), int(n), float(sv))])

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            _CappedSession(),
            outputStructType=SESSION_OUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
