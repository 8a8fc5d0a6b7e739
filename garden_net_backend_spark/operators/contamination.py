"""Benchmark-contamination detection for training corpora (north-star
extension: before a corpus trains a model, every document must be
screened for n-gram overlap with held-out evaluation sets).

Shape: the benchmark's distinct shingle set is the join side — eval
suites are millions of n-grams at most, so it broadcasts; the corpus
side is one shingle explode + equi-join + per-doc count. Cost is
linear in corpus shingles, never corpus × benchmark. At 100 TB the
only shuffle is the per-doc count aggregation (map-side combinable),
and a non-broadcastable mega-benchmark degrades gracefully to a
shuffle join on the shingle key.

The standard recipe (GPT-3 appendix C / PaLM: 8-13-gram collision
screening) maps to ``n=8, shingle="word"`` defaults; the oracle gate
runs word trigrams to share the proven shingle-parity SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import with_shingles


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    shingle: str = "word",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document contamination against a benchmark set →
    ``(id_col, n_shingles, n_contaminated, contamination_frac)``.

    ``n_contaminated`` counts the document's DISTINCT n-grams that
    appear anywhere in the benchmark; ``contamination_frac`` divides by
    the document's distinct n-gram count (0.0 for documents too short
    to form one n-gram). Every input document gets a row — filtering
    decisions (drop/flag thresholds) stay with the caller.
    """
    sh = with_shingles(docs, text_col, "_grams", n, shingle).select(
        F.col(id_col).alias("_id"), F.explode("_grams").alias("_sh")
    )
    bench = (
        with_shingles(benchmark, text_col, "_grams", n, shingle)
        .select(F.explode("_grams").alias("_sh"))
        .distinct()
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    hits = (
        sh.join(bench, "_sh", "left_semi")
        .groupBy("_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n_shingles"))
    return (
        docs.select(F.col(id_col))
        .join(sizes.withColumnRenamed("_id", id_col), id_col, "left")
        .join(hits.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_contaminated", F.lit(0))
                    / F.col("n_shingles").cast("double"),
                    9,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination_frac"),
        )
    )
