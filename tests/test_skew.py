"""Salted join / salted count: row-identical to the unsalted forms on a
deliberately skewed key distribution."""

import pytest
from pyspark.sql import functions as F

from garden_net_backend_spark.operators.skew import salted_count, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key
    rows = [(("hot" if i % 10 else f"k{i}"), i, float(i % 7)) for i in range(5000)]
    return spark.createDataFrame(rows, "key string, id long, v double")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [("hot", "H"), ("k10", "A"), ("k20", "B"), ("missing", "Z")],
        "key string, label string",
    )


def test_salted_inner_join_equivalence(skewed, dim):
    plain = {(r["id"], r["label"]) for r in skewed.join(dim, "key").collect()}
    salted = {
        (r["id"], r["label"]) for r in salted_join(skewed, dim, "key", n_salts=8).collect()
    }
    assert salted == plain and len(plain) > 4000


def test_salted_left_join_equivalence(skewed, dim):
    plain = {
        (r["id"], r["label"])
        for r in skewed.join(dim, "key", "left").collect()
    }
    salted = {
        (r["id"], r["label"])
        for r in salted_join(skewed, dim, "key", n_salts=8, how="left").collect()
    }
    assert salted == plain
    assert (10, None) in salted or any(lbl is None for _, lbl in salted)


def test_salted_count_equivalence(skewed):
    plain = {r["key"]: r["count"] for r in skewed.groupBy("key").count().collect()}
    salted = {r["key"]: r["count"] for r in salted_count(skewed, "key", n_salts=8).collect()}
    assert salted == plain
    assert plain["hot"] == 4500


def test_salted_join_rejects_unsupported_how(skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "key", how="full")


def test_interval_overlap_join_aqe_skew_split(spark):
    """The interval kernel's (chr, bin) equi-join is AQE-skew-splittable
    by construction (SURVEY §4: chr1 ≈ 10× chrY). With skew thresholds
    scaled down to test-data bytes, AQE must split the hot (chr1, bin 0)
    partition — SortMergeJoin(skew=true) in the final adaptive plan —
    and the result must stay row-identical to the exact theta join."""
    from garden_net_backend_spark.operators.interval import interval_overlap_join

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        # scale the skew thresholds down to test-data bytes (defaults
        # are sized for 256MB partitions); semantics are stock AQE
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")

        # 90% of intervals on chr1, all inside bin 0 → one hot join key
        chrom = (
            F.when(F.col("id") % 10 != 0, "1")
            .otherwise((F.col("id") % 9 + 2).cast("string"))
        )
        left = spark.range(0, 12000).select(
            chrom.alias("chr"),
            ((F.col("id") % 900) * 1000).alias("start"),
            ((F.col("id") % 900) * 1000 + 50).alias("end"),
            F.col("id").alias("lid"),
        )
        right = spark.range(0, 1200).select(
            chrom.alias("chr"),
            ((F.col("id") % 900) * 1000 + 20).alias("rstart"),
            ((F.col("id") % 900) * 1000 + 30).alias("rend"),
            (F.col("id") + 900000).alias("rid"),
        )
        out = interval_overlap_join(
            left, right, on="chr",
            left_range=("start", "end"), right_range=("rstart", "rend"),
        )
        agg = out.agg(F.count("*").alias("n"))
        n_binned = agg.collect()[0]["n"]
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan.splitlines()[0]
        assert "skew=true" in plan, "AQE did not split the hot (chr1, bin) key"

        # row-identical to the exact closed-interval theta join
        n_exact = left.join(
            right,
            (left["chr"] == right["chr"])
            & (left["start"] <= right["rend"])
            & (right["rstart"] <= left["end"]),
        ).count()
        assert n_binned == n_exact and n_binned > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_span_dedup_hot_window(spark):
    """Pathological substring-dedup input: EVERY document carries the
    same passage, so one window fingerprint has document frequency =
    corpus size. The kernel must stay correct (no candidate-pair
    blowup exists by construction — the duplicate test is a count, the
    join-back an equi-join AQE can skew-split) and the excision must
    keep exactly the first occurrence."""
    from garden_net_backend_spark.functions.plancheck import (
        assert_scalable_plan,
    )
    from garden_net_backend_spark.operators.dedup import (
        duplicated_spans,
        excise_duplicate_spans,
    )

    passage = " ".join(f"hot{i}" for i in range(8))
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("u"), F.col("id").cast("string")),
            F.lit(passage),
            F.concat(F.lit("v"), F.col("id").cast("string")),
        ).alias("text"),
    )
    spans = duplicated_spans(docs, min_tokens=8)
    assert_scalable_plan(spans)
    rows = spans.collect()
    # every doc hosts exactly one span covering the passage
    assert len(rows) == 2000
    assert {(r["span_begin"], r["span_end"]) for r in rows} == {(1, 9)}
    cleaned = excise_duplicate_spans(docs, min_tokens=8)
    kept = cleaned.filter(F.col("n_cut_tokens") == 0).collect()
    assert len(kept) == 1 and kept[0]["doc_id"] == 0
    assert cleaned.filter(F.col("n_cut_tokens") == 8).count() == 1999
