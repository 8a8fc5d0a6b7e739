"""Interval kernel tests: binned overlap join / flag / nearest /
overlap-aggregate vs in-Python brute force on seeded random intervals.
"""

import random

import pytest
from pyspark.sql import functions as F

from garden_net_backend_spark.operators.interval import (
    interval_overlap_join,
    nearest_interval_join,
    overlap_aggregate,
    overlap_flag,
    range_query,
)

random.seed(7)
CHROMS = ["1", "2", "X"]


def _mk_intervals(n, max_pos=5_000_000, max_len=2_500_000, prefix="i"):
    rows = []
    for k in range(n):
        s = random.randrange(max_pos)
        rows.append(
            (f"{prefix}{k}", random.choice(CHROMS), s, s + random.randrange(1, max_len))
        )
    return rows


LEFT = _mk_intervals(300, prefix="L")
RIGHT = _mk_intervals120 = _mk_intervals(120, prefix="R")


def _overlaps(a, b):
    return a[1] == b[1] and a[2] <= b[3] and b[2] <= a[3]


@pytest.fixture(scope="module")
def dfs(spark):
    ldf = spark.createDataFrame(LEFT, "lid string, chr string, start long, end long")
    rdf = spark.createDataFrame(
        RIGHT, "rid string, chr string, rstart long, rend long"
    )
    return ldf, rdf


def test_overlap_join_matches_bruteforce(dfs):
    ldf, rdf = dfs
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, left_range=("start", "end"), right_range=("rstart", "rend"),
            bin_size=100_000,
        ).collect()
    }
    want = {(a[0], b[0]) for a in LEFT for b in RIGHT if _overlaps(a, b)}
    assert got == want


def test_overlap_join_broadcast_path_matches(dfs):
    ldf, rdf = dfs
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, left_range=("start", "end"), right_range=("rstart", "rend"),
            broadcast_right=True,
        ).collect()
    }
    want = {(a[0], b[0]) for a in LEFT for b in RIGHT if _overlaps(a, b)}
    assert got == want


def test_overlap_flag(dfs):
    ldf, rdf = dfs
    got = {
        r["lid"]: r["hit"]
        for r in overlap_flag(
            ldf,
            rdf.select("chr", F.col("rstart").alias("start"), F.col("rend").alias("end")),
            flag_name="hit",
            bin_size=250_000,
        ).collect()
    }
    assert len(got) == len(LEFT)
    for a in LEFT:
        want = any(_overlaps(a, b) for b in RIGHT)
        assert got[a[0]] == want, a


def test_range_query(dfs):
    ldf, _ = dfs
    got = {r["lid"] for r in range_query(ldf, "2", 1_000_000, 2_000_000, expand=5_000).collect()}
    want = {
        a[0]
        for a in LEFT
        if a[1] == "2" and a[2] <= 2_005_000 and a[3] >= 995_000
    }
    assert got == want


def test_nearest_join_matches_bruteforce(dfs):
    ldf, rdf = dfs

    def dist(a, b):
        if a[1] != b[1]:
            return None
        return max(a[2] - b[3], b[2] - a[3], 0)

    got = {
        r["lid"]: (r["rid"], r["distance"])
        for r in nearest_interval_join(
            ldf,
            rdf,
            query_range=("start", "end"),
            target_range=("rstart", "rend"),
            target_id="rid",
        ).collect()
    }
    for a in LEFT:
        cands = [(dist(a, b), b) for b in RIGHT if b[1] == a[1]]
        if not cands:
            assert a[0] not in got
            continue
        best_d = min(d for d, _ in cands)
        best_ids = {b[0] for d, b in cands if d == best_d}
        rid, d = got[a[0]]
        assert d == best_d, (a, got[a[0]])
        assert rid in best_ids, (a, got[a[0]], best_ids)


def test_overlap_aggregate_mean_min_max_and_missing_fill(spark):
    nodes = spark.createDataFrame(
        [("n1", "1", 100, 200), ("n2", "1", 1000, 1100), ("n3", "2", 100, 200)],
        "fragment string, chr string, start long, end long",
    )
    feats = spark.createDataFrame(
        [
            ("1", 150, 160, "EZH2", 2.0),
            ("1", 190, 300, "EZH2", 4.0),
            ("1", 0, 5000, "H3K27", 10.0),
            ("2", 500, 600, "EZH2", 7.0),
        ],
        "chr string, start long, end long, feature string, value double",
    )
    for agg, n1_ezh2 in [("mean", 3.0), ("min", 2.0), ("max", 4.0)]:
        got = {
            (r["fragment"], r["feature"]): r["value"]
            for r in overlap_aggregate(nodes, feats, agg=agg, bin_size=1000).collect()
        }
        assert len(got) == 6  # dense 3 nodes × 2 features
        assert got[("n1", "EZH2")] == n1_ezh2
        assert got[("n1", "H3K27")] == 10.0
        assert got[("n2", "EZH2")] == 0.0  # missing fill
        assert got[("n3", "EZH2")] == 0.0  # wrong-chr feature not joined
        assert got[("n3", "H3K27")] == 0.0

    with pytest.raises(ValueError):
        overlap_aggregate(nodes, feats, agg="eval_me")
