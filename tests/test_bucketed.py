"""Bucketed serving tables: the bucketed side joins WITHOUT an Exchange
(plan-verified), and results equal the unbucketed join."""

import pytest
from pyspark.sql import functions as F

from garden_net_backend_spark.plans.materialize import write_bucketed_search_tables
from garden_net_backend_spark.plans.search import build_token_index


@pytest.fixture(scope="module")
def served(spark):
    nodes = spark.createDataFrame(
        [(f"1_{i}_{i+50}", f"Gene{i % 37} Alt{i % 11}", "1", i, i + 50, "P", i % 5)
         for i in range(0, 5000, 10)],
        "fragment string, gene_names string, chr string, start long, end long, type string, degree long",
    )
    tables = write_bucketed_search_tables(nodes, build_token_index(nodes), n_buckets=8)
    return nodes, tables


def test_bucketed_join_has_no_exchange(spark, served):
    """Both sides bucketed on the join key → SortMergeJoin with ZERO
    Exchange (the shuffle-free co-located join bucketing exists for).
    Broadcast is disabled so the join can't sidestep the question."""
    nodes, tables = served
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = spark.table(tables["nodes"])
        a = bucketed.select("fragment", "degree")
        b = bucketed.select(F.col("fragment"), F.col("gene_names"))
        joined = a.join(b, "fragment")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:1500]
        assert "Bucketed: true" in plan
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_token_lookup_matches_plain(spark, served):
    nodes, tables = served
    tok = spark.table(tables["token_index"])
    plain = build_token_index(nodes)
    want = {r["fragment"] for r in plain.filter(F.col("token") == "gene5").collect()}
    got = {r["fragment"] for r in tok.filter(F.col("token") == "gene5").collect()}
    assert got == want and got
