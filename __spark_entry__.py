"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``garden_net_backend_spark``; this module is a
thin adapter over its query catalog (garden_net_backend_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from garden_net_backend_spark.queries import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's §7.1
    batch pipeline as one Spark plan — threshold filter → fragment
    keys → P-P/P-O edge typing → vertex collapse → simplify → degree
    (build_network, plans/network_build.py)."""
    return CATALOG["q63_network_build_slice"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark_fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    non-SQL-expressible ops → rows-only check)."""
    return {
        name: spec.oracle_sql
        for name, spec in CATALOG.items()
        if spec.oracle_sql is not None
    }
