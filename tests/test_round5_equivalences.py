"""Round-5 refactor equivalence pins: each test locks a rewritten path
to the behavior of the kernel/plan it replaced, so the cheaper shape
can never silently diverge.

1. The search nearest-fallback (one chromosome-pruned min(struct)
   aggregate) must pick the SAME fragment, with the same tie-break, as
   the generic union-sort `nearest_interval_join` kernel it replaced.
2. `randomize_edges_distance_matched(strata=precomputed)` must emit the
   identical permutation as the internal-stratification path.
3. `chas(broadcast_features=True)` must equal the default-join path.
"""

import random

import pytest
from pyspark.sql import functions as F

from garden_net_backend_spark.operators.chas import (
    chas,
    edge_strata,
    randomize_edges_distance_matched,
)
from garden_net_backend_spark.operators.interval import nearest_interval_join
from garden_net_backend_spark.plans.search import resolve_search_seeds


@pytest.fixture(scope="module")
def nodes(spark):
    rng = random.Random(5)
    rows = []
    for i in range(300):
        chrom = str(rng.randint(1, 4))
        start = rng.randrange(0, 100_000, 10)
        rows.append((f"{chrom}_{start}_{start + 99}", "", chrom, start, start + 99, "P" if i % 3 else "O"))
    return spark.createDataFrame(
        # dedup fragments (same (chrom,start) can repeat)
        list({r[0]: r for r in rows}.values()),
        "fragment string, gene_names string, chr string, start long, end long, type string",
    ).localCheckpoint(eager=True)


def _kernel_winner(spark, nodes, chrom, qs, qe):
    q = spark.createDataFrame([(chrom, qs, qe)], "chr string, qs long, qe long")
    nn = nearest_interval_join(
        q,
        nodes.select("chr", "start", "end", "fragment"),
        on="chr",
        query_range=("qs", "qe"),
        target_range=("start", "end"),
        target_id="fragment",
    )
    rows = nn.select("fragment").collect()
    return rows[0]["fragment"] if rows else None


def test_nearest_fallback_matches_asof_kernel(spark, nodes):
    rng = random.Random(7)
    cases = [("2", 10_000_000), ("1", 0)]  # far right (no overlap), far left
    for _ in range(10):
        cases.append((str(rng.randint(1, 4)), rng.randrange(0, 110_000)))
    for chrom, p in cases:
        got = resolve_search_seeds(nodes, f"{chrom}:{p}", nearest=True).collect()
        want = _kernel_winner(spark, nodes, chrom, p, p)
        assert [r["fragment"] for r in got] == ([want] if want else [])
        assert all(r["kind"] == "range" for r in got)


def test_nearest_fallback_tie_break_matches_kernel(spark):
    # two targets exactly equidistant from the query point — the pinned
    # (distance, start, end, id) order must pick the same one both ways
    nodes = spark.createDataFrame(
        [
            ("1_100_150", "", "1", 100, 150, "P"),
            ("1_250_300", "", "1", 250, 300, "P"),
        ],
        "fragment string, gene_names string, chr string, start long, end long, type string",
    )
    got = [r["fragment"] for r in resolve_search_seeds(nodes, "1:200", nearest=True).collect()]
    want = _kernel_winner(nodes.sparkSession, nodes, "1", 200, 200)
    assert got == [want] == ["1_100_150"]


def test_randomizer_precomputed_strata_identical(spark, nodes):
    edges = (
        nodes.alias("a")
        .join(nodes.alias("b"), F.col("a.chr") == F.col("b.chr"))
        .filter(F.col("a.fragment") < F.col("b.fragment"))
        .select(F.col("a.fragment").alias("src"), F.col("b.fragment").alias("dst"))
        .limit(500)
        .localCheckpoint(eager=True)
    )
    kw = dict(n_random=2, seed=11, dist_match=True, keep_stratum=True)
    inline = randomize_edges_distance_matched(edges, nodes, **kw)
    pre = edge_strata(edges, nodes, dist_match=True).localCheckpoint(eager=True)
    reused = randomize_edges_distance_matched(edges, nodes, strata=pre, **kw)
    a = sorted(map(tuple, inline.collect()))
    b = sorted(map(tuple, reused.collect()))
    assert a == b and len(a) > 0


def test_chas_broadcast_features_identical(spark, nodes):
    edges = (
        nodes.alias("a")
        .join(nodes.alias("b"), F.col("a.chr") == F.col("b.chr"))
        .filter(F.col("a.fragment") < F.col("b.fragment"))
        .select(F.col("a.fragment").alias("src"), F.col("b.fragment").alias("dst"))
        .limit(400)
    )
    feats = nodes.select(
        "fragment",
        F.lit("F0").alias("feature"),
        (F.crc32(F.col("fragment")) % 7).cast("double").alias("value"),
    ).union(
        nodes.select(
            "fragment",
            F.lit("F1").alias("feature"),
            (F.crc32(F.col("fragment")) % 3).cast("double").alias("value"),
        )
    )
    plain = {r["feature"]: r["chas"] for r in chas(edges, feats).collect()}
    bcast = {
        r["feature"]: r["chas"]
        for r in chas(edges, feats, broadcast_features=True).collect()
    }
    assert plain == bcast and len(plain) == 2


def test_randomizer_adversarial_graph_invariants(spark):
    """Invariants on a graph the q70 gate's corpus never produces:
    duplicate coordinates (distance-0 pairs), interchromosomal edges
    (stratum -1), a singleton stratum, and n_random close to |E|."""
    from collections import Counter, defaultdict

    ndf = spark.createDataFrame(
        [
            ("A", "1", 0, 10),
            ("B", "1", 0, 10),  # duplicate coords → zero distance
            ("C", "1", 5, 15),
            ("D", "2", 0, 10),
            ("E", "2", 1_000_000, 1_000_100),
            ("F", "3", 7, 17),
        ],
        "fragment string, chr string, start long, end long",
    )
    edf = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C"), ("A", "D"), ("D", "E"), ("E", "F")],
        "src string, dst string",
    )
    orig = [
        (r["src"], r["dst"], r["stratum"])
        for r in edge_strata(edf, ndf).collect()
    ]
    assert {st for _, _, st in orig} >= {-1}  # cross-chr stratum present
    rand = randomize_edges_distance_matched(
        edf, ndf, n_random=5, seed=3, keep_stratum=True
    )
    rows = rand.collect()

    def by_stratum(triples):
        out = defaultdict(lambda: (Counter(), Counter()))
        for s, d, st in triples:
            out[st][0][s] += 1
            out[st][1][d] += 1
        return out

    want = by_stratum(orig)
    for run in range(5):
        es = [
            (r["src"], r["dst"], r["stratum"]) for r in rows if r["run"] == run
        ]
        assert len(es) == 6  # histogram: every edge exactly once
        got = by_stratum(es)
        assert got.keys() == want.keys()
        for st in want:
            assert got[st] == want[st]  # per-stratum endpoint multisets
