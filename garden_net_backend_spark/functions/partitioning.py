"""Partition-layout helpers.

Small parquet files arrive as ONE input partition (a single row group
under ``spark.sql.files.maxPartitionBytes``), which serializes every
downstream per-row computation onto one core. Operators whose per-row
cost is high (shingling, hashing, decimal dot products) must not
inherit that accident: ``ensure_min_partitions`` fans the scan out to
the cluster's parallelism when the source is under-partitioned, and is
a no-op on well-partitioned (large) inputs — so it is safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
