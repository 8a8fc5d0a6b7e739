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
