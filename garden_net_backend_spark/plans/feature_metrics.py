"""Feature-merge job: the reference's async upload pipeline
(merge_features.R via backend.py:217-331; SURVEY.md §3.3) as a
parameterized batch plan.

Input: the built network (nodes, edges) + a feature interval table in
any supported format (sources/readers.read_feature) + the aggregation
fn name. Output: the dense per-node feature matrix and the nested
metadata bundle the reference writes to features_metadata.json
(reference merge_features.R:78-136, network_generator.R:252-266):

    {net|pp|po: {Abundance, ChAs, "Random ChAs interval", "Mean degree"}}

Reference parity details (merge_features.R:74-104 +
generate_features_metadata, network_generator_lib.R:534-566):

- every metric is computed ON THE SUBSET NETWORK: chaser's
  subset_chromnet rebuilds the chromnet from the subset edge list, so
  the pp/po node sets are the endpoints of the subset edges, degrees
  are recomputed from the subset edges, and Abundance averages over
  subset nodes only;
- the random-ChAS interval is per subnetwork, nested inside each of
  net/pp/po — net and pp randomize with distance matching and
  ``randomizations = 1`` (merge_features.R:79,91), po with
  ``preserve.distances = F`` and the generate_features_metadata
  default of 50 randomizations (merge_features.R:103);
- rounding/encoding follows the reference: Abundance and mean degree
  round to 2 decimals, the random interval rounds to 3 and serializes
  as a ``"min,max"`` string (network_generator_lib.R:554,560,566).

The Celery/Redis/FIFO plumbing around it is API-layer, not engine
(SURVEY §3.3): submit this plan on a scheduler pool and surface
progress via SparkListener stage counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import exact_corr
from ..operators.chas import (
    chas,
    feature_abundance,
    feature_mean_degree,
    randomize_edges_distance_matched,
)
from ..operators.graph import degrees, subset_edges_by_nodesets
from ..operators.interval import overlap_aggregate


def merge_features(
    nodes: DataFrame,
    feature_intervals: DataFrame,
    agg: str = "mean",
    missing_value: float = 0.0,
    binarize: bool = False,
) -> DataFrame:
    """Overlap-aggregate feature intervals onto network nodes → dense
    long-form (fragment, feature, value). ``agg`` dispatches by name
    (mean/min/max — reference auxfun, backend.py:204). ``binarize``
    collapses values to presence 0/1 (the reference's default feature
    binarization, --no-features-binarization flag at
    network_generator_lib.R:31-35; SURVEY A11)."""
    out = overlap_aggregate(
        nodes.select("fragment", "chr", "start", "end"),
        feature_intervals,
        agg=agg,
        missing_value=missing_value,
    )
    if binarize:
        out = out.withColumn(
            "value", F.when(F.col("value") != 0, 1.0).otherwise(0.0)
        )
    return out


def _endpoint_nodes(sub_edges: DataFrame) -> DataFrame:
    """Node set of a subset chromnet = endpoints of its edge list
    (chaser subset_chromnet rebuilds the network from the subset
    edges)."""
    return (
        sub_edges.select(F.col("src").alias("fragment"))
        .union(sub_edges.select(F.col("dst").alias("fragment")))
        .distinct()
    )


def _random_chas_interval(
    nodes: DataFrame,
    sub_edges: DataFrame,
    features_sub: DataFrame,
    n_random: int,
    seed: int,
    dist_match: bool,
) -> dict:
    """{feature: "min,max"} across ``n_random`` randomizations of the
    SUBSET edge list (chaser randomize(subnet); SURVEY A6/G12) — all
    runs evaluated in ONE job via the run-id fan-out, not the
    reference's serial loop. Interval bounds round to 3 decimals and
    encode as the reference's 'min,max' string
    (network_generator_lib.R:554)."""
    rand_edges = randomize_edges_distance_matched(
        sub_edges, nodes, n_random=n_random, seed=seed, dist_match=dist_match
    )
    sym = rand_edges.select("run", "src", "dst").union(
        rand_edges.select(
            "run", F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    f_src = features_sub.select(
        F.col("fragment").alias("src"), "feature", F.col("value").alias("x")
    )
    f_dst = features_sub.select(
        F.col("fragment").alias("dst"), "feature", F.col("value").alias("y")
    )
    per_run = (
        # network-sized feature grid → broadcast lookups, the n_random-
        # fanned edge stream stays shuffle-free (chas docstring)
        sym.join(F.broadcast(f_src), "src")
        .join(F.broadcast(f_dst), ["dst", "feature"])
        .groupBy("run", "feature")
        .agg(exact_corr(F.col("x"), F.col("y")).alias("chas"))
    )
    bounds = per_run.groupBy("feature").agg(
        F.round(F.min("chas"), 3).alias("lo"), F.round(F.max("chas"), 3).alias("hi")
    )
    return {
        r["feature"]: (
            f"{r['lo']},{r['hi']}"
            if r["lo"] is not None and r["hi"] is not None
            else None
        )
        for r in bounds.collect()
    }


def _metrics_for_subset(
    nodes: DataFrame,
    features_long: DataFrame,
    sub_edges: DataFrame,
    n_random: int,
    seed: int,
    dist_match: bool,
) -> dict:
    """One generate_features_metadata call (reference
    network_generator_lib.R:534-566) over a (sub)network: features
    restricted to the subnet's node set, degrees recomputed from the
    subnet's edges, Abundance/mean degree rounded to 2 decimals."""
    features_sub = features_long.join(
        _endpoint_nodes(sub_edges), "fragment", "left_semi"
    )
    deg = degrees(sub_edges.select("src", "dst"))
    ab = {
        r["feature"]: r["abundance"]
        for r in feature_abundance(features_sub, decimals=2).collect()
    }
    ch = {
        r["feature"]: (round(r["chas"], 6) if r["chas"] is not None else None)
        for r in chas(sub_edges, features_sub, broadcast_features=True).collect()
    }
    md = {
        r["feature"]: r["mean_degree"]
        for r in feature_mean_degree(features_sub, deg, decimals=2).collect()
    }
    out = {"Abundance": ab, "ChAs": ch}
    if n_random > 0:
        out["Random ChAs interval"] = _random_chas_interval(
            nodes, sub_edges, features_sub, n_random, seed, dist_match
        )
    out["Mean degree"] = md
    return out


def feature_metadata(
    nodes: DataFrame,
    edges: DataFrame,
    features_long: DataFrame,
    n_random: int = 1,
    n_random_po: int = 50,
    seed: int = 42,
    skip_pp_po: bool = False,
) -> dict:
    """The {net, pp, po} metadata triple (reference
    network_generator.R:255-266; merge_features.R:74-108 — Hi-C cell
    types skip pp/po via ``skip_pp_po``, reference merge_features.R:88).

    Defaults mirror the reference call sites: net and pp randomize
    once with distance matching (merge_features.R:79,91); po uses
    ``preserve.distances = F`` and generate_features_metadata's
    default of 50 randomizations (merge_features.R:103).
    """
    e = edges.select("src", "dst")
    out: dict = {
        "net": _metrics_for_subset(
            nodes, features_long, e, n_random, seed, dist_match=True
        )
    }

    if skip_pp_po:
        out["pp"] = None
        out["po"] = None
        return out

    baits = nodes.filter(F.col("type") == "P").select(
        F.col("fragment").alias("node")
    )
    oes = nodes.filter(F.col("type") == "O").select(F.col("fragment").alias("node"))
    pp_edges = subset_edges_by_nodesets(e, baits)
    po_edges = subset_edges_by_nodesets(e, baits, oes)
    out["pp"] = _metrics_for_subset(
        nodes, features_long, pp_edges, n_random, seed, dist_match=True
    )
    out["po"] = _metrics_for_subset(
        nodes, features_long, po_edges, n_random_po, seed, dist_match=False
    )
    return out
