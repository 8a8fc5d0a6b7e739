"""As-of join vs Python brute force, including the tie cases."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from garden_net_backend_spark.operators.asof import asof_join_backward


def ts(s):
    return datetime.fromisoformat(s)


LEFT = [  # (lid, key, time)
    (1, "a", ts("2024-01-01T10:00:00")),
    (2, "a", ts("2024-01-01T10:05:00")),
    (3, "a", ts("2024-01-01T09:00:00")),  # before any right row
    (4, "b", ts("2024-01-01T10:00:00")),  # equal-timestamp match (inclusive)
    (5, "c", ts("2024-01-01T10:00:00")),  # key with no right rows
]
RIGHT = [  # (key, time, value, tb)
    ("a", ts("2024-01-01T09:30:00"), 1.0, 1),
    ("a", ts("2024-01-01T10:02:00"), 2.0, 2),
    ("b", ts("2024-01-01T10:00:00"), 3.0, 3),
    ("b", ts("2024-01-01T10:00:00"), 4.0, 4),  # tie on (key, time) → max tb wins
]


def test_asof_backward_bruteforce(spark):
    ldf = spark.createDataFrame(LEFT, "lid long, k string, t timestamp")
    rdf = spark.createDataFrame(RIGHT, "k string, t timestamp, value double, tb long")
    got = {
        r["lid"]: (r["asof_time"], r["value"])
        for r in asof_join_backward(
            ldf, rdf, key="k", left_time="t", right_time="t",
            payload=["value"], tiebreak="tb",
        ).collect()
    }
    def brute(lk, lt):
        cands = [r for r in RIGHT if r[0] == lk and r[1] <= lt]
        if not cands:
            return (None, None)
        best = max(cands, key=lambda r: (r[1], r[3]))
        return (best[1], best[2])

    for lid, lk, lt in LEFT:
        assert got[lid] == brute(lk, lt), (lid, got[lid], brute(lk, lt))
    # the specific semantics worth naming:
    assert got[1] == (ts("2024-01-01T09:30:00"), 1.0)   # strictly before
    assert got[2] == (ts("2024-01-01T10:02:00"), 2.0)   # latest prior
    assert got[3] == (None, None)                        # nothing prior
    assert got[4] == (ts("2024-01-01T10:00:00"), 4.0)   # inclusive + tie → max tb
    assert got[5] == (None, None)                        # empty key
