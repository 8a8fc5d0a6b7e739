"""Training-corpus IO (north-star extension): the formats an LLM data
pipeline actually ingests and emits.

- ``read_documents_jsonl``: JSON-lines documents with a DECLARED schema
  (inference on a stream of terabytes is a two-pass anti-pattern and a
  schema-drift hazard) and PERMISSIVE corrupt-record capture — bad rows
  land in ``_corrupt_record`` instead of killing the job, and the
  caller decides whether the bad-row rate is acceptable.
- ``write_training_shards``: packed sequences → deterministic,
  size-balanced parquet shards. Shard assignment is
  ``seq_id % n_shards`` (pure math, reproducible across runs —
  ``repartitionByRange`` would depend on sampled boundaries), with one
  file per shard and sequences sorted within.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines corpus scan → declared-schema DataFrame with corrupt
    rows captured, not fatal. Gzip transparency comes free from the
    Spark text source (same as the S4 contract for TSV)."""
    return (
        spark.read.schema(schema or DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def corrupt_rate(docs: DataFrame) -> float:
    """Fraction of input rows that failed parsing (0.0 when the scan
    has no corrupt-record column)."""
    if "_corrupt_record" not in docs.columns:
        return 0.0
    row = docs.agg(
        F.count("*").alias("n"),
        F.count("_corrupt_record").alias("bad"),
    ).collect()[0]
    return (row["bad"] / row["n"]) if row["n"] else 0.0


def write_training_shards(
    sequences: DataFrame,
    path: str,
    n_shards: int = 64,
    seq_col: str = "seq_id",
) -> None:
    """Write packed sequences as ``n_shards`` deterministic parquet
    shards partitioned by ``shard = seq_id % n_shards`` — reproducible
    across runs and engines (no sampled range boundaries), balanced
    because seq_ids are dense per source, one sorted file per shard so
    a trainer streams each shard in sequence order."""
    (
        sequences.withColumn(
            "shard", (F.col(seq_col) % n_shards).cast("int")
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", seq_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
