"""Materialization layer: partitioned write, serving reload, partition
pruning actually reaching the physical plan, and Hi-C mode end-to-end."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from garden_net_backend_spark.plans.materialize import (
    chromosome_view,
    load_serving_session,
    write_network,
)
from garden_net_backend_spark.plans.network_build import build_network
from garden_net_backend_spark.plans.search import search_subnetwork
from garden_net_backend_spark.sources.readers import load_hic


@pytest.fixture(scope="module")
def built(spark):
    rows = []
    for c in ["1", "2", "X"]:
        for i in range(5):
            rows.append(
                (c, i * 1000, i * 1000 + 500, i, f"Gene{c}{i}",
                 c, (i + 1) * 1000, (i + 1) * 1000 + 500, i + 100, ".", 1000.0, 9.0)
            )
    inter = spark.createDataFrame(
        rows,
        "baitChr string, baitStart long, baitEnd long, baitID long, baitName string,"
        "oeChr string, oeStart long, oeEnd long, oeID long, oeName string,"
        "dist double, score double",
    )
    return build_network(inter, wt_threshold=5.0)


def test_write_load_roundtrip_and_pruning(spark, built):
    nodes, edges = built
    d = tempfile.mkdtemp(prefix="matview_")
    write_network(nodes, edges, d)
    served = load_serving_session(spark, d, persist=False)
    assert served["nodes"].count() == nodes.count()
    assert served["edges"].count() == edges.count()
    assert served["token_index"].count() > 0
    # partition layout on disk
    assert os.path.isdir(os.path.join(d, "nodes", "chr=X"))
    # partition pruning reaches the scan
    view = chromosome_view(served["nodes"], "X")
    plan = view._jdf.queryExecution().executedPlan().toString()
    assert "chr=X" in plan or "PartitionFilters" in plan
    assert view.count() == nodes.filter(F.col("chr") == "X").count()
    # search works against the served tables
    sn, _ = search_subnetwork(served["nodes"], served["edges"], "GeneX2")
    assert sn.count() > 0


def test_hic_mode_end_to_end(spark):
    d = tempfile.mkdtemp(prefix="hic_")
    p = os.path.join(d, "hic.tsv")
    with open(p, "w") as fh:
        fh.write("chrom_from\tstart_from\tend_from\tchrom_to\tstart_to\tend_to\n")
        fh.write("1\t100\t200\t1\t300\t400\n")
        fh.write("1\t300\t400\t2\t100\t200\n")
    hic = load_hic(spark, p)
    assert hic.columns == ["baitChr", "baitStart", "baitEnd", "oeChr", "oeStart", "oeEnd"]
    # Hi-C has no score column; the engine builds with a synthetic one
    inter = hic.withColumn("baitID", F.lit(None).cast("long")) \
        .withColumn("baitName", F.lit("")) \
        .withColumn("oeID", F.lit(None).cast("long")) \
        .withColumn("oeName", F.lit("")) \
        .withColumn("dist", F.lit(None).cast("double")) \
        .withColumn("score", F.lit(10.0)) \
        .select("baitChr", "baitStart", "baitEnd", "baitID", "baitName",
                "oeChr", "oeStart", "oeEnd", "oeID", "oeName", "dist", "score")
    nodes, edges = build_network(inter, wt_threshold=5.0, hic_mode=True)
    # all O-O in Hi-C mode (reference network_generator.R:59)
    assert {r["type"] for r in edges.collect()} == {"O-O"}
    assert {r["type"] for r in nodes.collect()} == {"O"}
