"""Materialization layer — the engine's replacement for the reference's
Rdata caches and per-chromosome JSON dumps (SURVEY.md S9/S12, §3.1).

The reference persists three caches (search_cache.Rdata,
merge_features_cache.Rdata, layouted per-chromosome JSON) rebuilt by a
bash pipeline. Here the built network is written ONCE as
chromosome-partitioned parquet; every per-chromosome view is then a
partition-pruned scan, and a serving session loads + persists the
tables for interactive search.

At 100 TB: ``partitionBy("chr")`` gives partition pruning for the F2
chromosome filters; bucketing nodes and the token index by their join
keys (``bucketBy`` into a warehouse table) makes search equi-joins
shuffle-free. Both are demonstrated here with plain parquet +
``partitionBy`` (no Hive metastore assumed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .search import build_token_index

NODES_DIR = "nodes"
EDGES_DIR = "edges"
TOKENS_DIR = "token_index"
FEATURES_DIR = "features"


def write_network(
    nodes: DataFrame,
    edges: DataFrame,
    out_dir: str,
    features_long: DataFrame | None = None,
) -> None:
    """Persist the built network:

    - nodes partitioned by chromosome (partition pruning serves every
      per-chromosome query — the reference's 24-way file fan-out,
      without the 24 processes);
    - edges partitioned by the SOURCE endpoint's chromosome (an
      undirected edge touching two chromosomes is still discoverable
      via the disjunctive filter — same semantics as reference F2);
    - the inverted token index for gene search.
    """
    nodes.write.mode("overwrite").partitionBy("chr").parquet(
        os.path.join(out_dir, NODES_DIR)
    )
    e = edges.withColumn("src_chr", F.split(F.col("src"), "_").getItem(0))
    e.write.mode("overwrite").partitionBy("src_chr").parquet(
        os.path.join(out_dir, EDGES_DIR)
    )
    build_token_index(nodes).write.mode("overwrite").parquet(
        os.path.join(out_dir, TOKENS_DIR)
    )
    if features_long is not None:
        features_long.write.mode("overwrite").parquet(
            os.path.join(out_dir, FEATURES_DIR)
        )


def load_serving_session(
    spark: SparkSession, out_dir: str, persist: bool = True
) -> dict[str, DataFrame]:
    """Load the materialized tables for the interactive-serving session
    (the reference's search_cache.Rdata load, search_query.R:14) and
    pin them in executor memory."""
    out = {
        "nodes": spark.read.parquet(os.path.join(out_dir, NODES_DIR)),
        "edges": spark.read.parquet(os.path.join(out_dir, EDGES_DIR)).drop("src_chr"),
        "token_index": spark.read.parquet(os.path.join(out_dir, TOKENS_DIR)),
    }
    fdir = os.path.join(out_dir, FEATURES_DIR)
    if os.path.exists(fdir):
        out["features"] = spark.read.parquet(fdir)
    if persist:
        for df in out.values():
            df.persist()
    return out


def write_bucketed_search_tables(
    nodes: DataFrame,
    token_index: DataFrame | None = None,
    n_buckets: int = 16,
    prefix: str = "gn",
) -> dict[str, str]:
    """Bucketed serving tables: ``bucketBy(fragment)`` for nodes and
    ``bucketBy(token)`` for the inverted index, so search equi-joins
    co-locate WITHOUT a shuffle on the big side (SortMergeJoin with no
    Exchange under the bucketed scan — verified in tests).

    Uses ``saveAsTable`` into the session's spark_catalog warehouse
    (bucket metadata needs a table catalog; plain parquet paths can't
    carry it). At 100 TB this is the difference between re-shuffling
    the node table per query and reading exactly the matching buckets.
    Returns {logical_name: catalog_table_name}.
    """
    import shutil
    from urllib.parse import urlparse

    spark = nodes.sparkSession

    def _clean(table: str) -> None:
        # a previous session may have left the managed-table directory
        # without a catalog entry in THIS session (in-memory catalog) —
        # saveAsTable then fails with LOCATION_ALREADY_EXISTS
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        path = os.path.join(wh, table)
        if os.path.exists(path):
            shutil.rmtree(path, ignore_errors=True)

    def _save(df: DataFrame, table: str, key: str) -> None:
        _clean(table)
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(table)
        )

    out = {}
    t_nodes = f"{prefix}_nodes_bucketed"
    _save(nodes, t_nodes, "fragment")
    out["nodes"] = t_nodes
    if token_index is not None:
        t_tok = f"{prefix}_token_index_bucketed"
        _save(token_index, t_tok, "token")
        out["token_index"] = t_tok
    return out


def write_artifacts(
    nodes: DataFrame,
    edges: DataFrame,
    out_dir: str,
    features_long: DataFrame | None = None,
) -> dict:
    """The small JSON artifacts the reference writes next to the network
    (SURVEY S11; reference network_generator.R:184-188, 270-284):
    metadata.json, suggestions.json, chromosomes.json[, features.json].
    These are aggregate-sized → collected and dumped driver-side; the
    big per-chromosome element files are the partitioned parquet +
    cytoscape_elements stream, not these."""
    import json

    from .network_build import chromosome_list, network_metadata, suggestions

    meta = network_metadata(nodes, edges)
    sugg = [r["suggestion"] for r in suggestions(nodes).collect()]
    chroms = chromosome_list(nodes)
    artifacts = {
        "metadata.json": meta,
        "suggestions.json": sugg,
        "chromosomes.json": chroms,
    }
    if features_long is not None:
        feats = sorted(
            r["feature"] for r in features_long.select("feature").distinct().collect()
        )
        artifacts["features.json"] = feats
    os.makedirs(out_dir, exist_ok=True)
    for name, payload in artifacts.items():
        with open(os.path.join(out_dir, name), "w") as fh:
            json.dump(payload, fh)
    return artifacts


def chromosome_view(nodes: DataFrame, chromosome: str) -> DataFrame:
    """Per-chromosome node view — a partition-pruned scan of the
    materialized table (check: .explain() shows PartitionFilters on
    chr, not a full scan)."""
    return nodes.filter(F.col("chr") == chromosome)
