"""Feature-merge job: the reference's async upload pipeline
(merge_features.R via backend.py:217-331; SURVEY.md §3.3) as a
parameterized batch plan.

Input: the built network (nodes, edges) + a feature interval table in
any supported format (sources/readers.read_feature) + the aggregation
fn name. Output: the dense per-node feature matrix and the nested
metadata bundle {net|pp|po: {Abundance, ChAs, MeanDegree,
RandomChAs_min/max}} the reference writes to features_metadata.json
(reference merge_features.R:78-136, network_generator.R:252-266).

The Celery/Redis/FIFO plumbing around it is API-layer, not engine
(SURVEY §3.3): submit this plan on a scheduler pool and surface
progress via SparkListener stage counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def _metrics_for_subset(
    features_long: DataFrame, sub_edges: DataFrame, deg: DataFrame
) -> dict:
    ab = {
        r["feature"]: r["abundance"] for r in feature_abundance(features_long).collect()
    }
    ch = {
        r["feature"]: (round(r["chas"], 6) if r["chas"] is not None else None)
        for r in chas(sub_edges, features_long).collect()
    }
    md = {
        r["feature"]: r["mean_degree"]
        for r in feature_mean_degree(features_long, deg).collect()
    }
    return {"Abundance": ab, "ChAs": ch, "MeanDegree": md}


def feature_metadata(
    nodes: DataFrame,
    edges: DataFrame,
    features_long: DataFrame,
    n_random: int = 10,
    seed: int = 42,
    skip_pp_po: bool = False,
) -> dict:
    """The {net, pp, po} metadata triple (reference
    network_generator.R:255-266; merge_features.R:78-108 — Hi-C cell
    types skip pp/po via ``skip_pp_po``, reference merge_features.R:88).

    Random-ChAS interval: min/max per feature across ``n_random``
    distance-matched edge randomizations (SURVEY A6/G12) — all runs
    evaluated in ONE job via the run-id fan-out, not a serial loop.
    """
    deg = degrees(edges.select("src", "dst"))
    out: dict = {"net": _metrics_for_subset(features_long, edges, deg)}

    if not skip_pp_po:
        baits = nodes.filter(F.col("type") == "P").select(
            F.col("fragment").alias("node")
        )
        oes = nodes.filter(F.col("type") == "O").select(
            F.col("fragment").alias("node")
        )
        pp_edges = subset_edges_by_nodesets(edges, baits)
        po_edges = subset_edges_by_nodesets(edges, baits, oes)
        out["pp"] = _metrics_for_subset(features_long, pp_edges, deg)
        out["po"] = _metrics_for_subset(features_long, po_edges, deg)

    if n_random > 0:
        rand_edges = randomize_edges_distance_matched(
            edges, nodes, n_random=n_random, seed=seed
        )
        # per (run, feature) ChAS in one aggregation, then min/max per
        # feature (SURVEY A6)
        sym = rand_edges.select("run", "src", "dst").union(
            rand_edges.select("run", F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        f_src = features_long.select(
            F.col("fragment").alias("src"), "feature", F.col("value").alias("x")
        )
        f_dst = features_long.select(
            F.col("fragment").alias("dst"), "feature", F.col("value").alias("y")
        )
        from ..functions.exact import exact_corr

        per_run = (
            sym.join(f_src, "src")
            .join(f_dst, ["dst", "feature"])
            .groupBy("run", "feature")
            .agg(exact_corr(F.col("x"), F.col("y")).alias("chas"))
        )
        bounds = per_run.groupBy("feature").agg(
            F.round(F.min("chas"), 6).alias("lo"), F.round(F.max("chas"), 6).alias("hi")
        )
        out["random_chas"] = {
            r["feature"]: [r["lo"], r["hi"]] for r in bounds.collect()
        }
    return out
