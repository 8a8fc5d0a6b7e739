"""Corpus profile: one-scan observability summaries."""

from pyspark.sql import functions as F

from garden_net_backend_spark.plans.profile import corpus_profile


def test_corpus_profile_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = corpus_profile(docs)
    o = out["overall"].collect()[0]
    n = docs.count()
    assert o["n_docs"] == n
    # exact cross-checks against direct aggregates
    want_tokens = docs.select(
        F.sum(F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "")))
    ).collect()[0][0]
    assert o["n_tokens"] == want_tokens
    q = o["token_quantiles"]
    assert len(q) == 4 and q[0] <= q[1] <= q[2] <= q[3]
    assert 0.0 <= o["mean_quality"] <= 1.0
    assert 0.0 <= o["gopher_keep_rate"] <= 1.0
    assert 0.0 <= o["approx_dup_rate"] <= 1.0
    # language rows partition the corpus
    langs = out["by_lang"].collect()
    assert sum(r["n_docs"] for r in langs) == n
    # by_source appears iff the column exists
    assert "by_source" in out
    srcs = out["by_source"].collect()
    assert sum(r["n_docs"] for r in srcs) == n
    assert "by_source" not in corpus_profile(docs.drop("source"))


def test_corpus_profile_dup_rate(spark):
    docs = spark.createDataFrame(
        [(i, "exactly the same text content here") for i in range(20)]
        + [(100 + i, f"unique document number {i} with words") for i in range(20)],
        "doc_id long, text string",
    )
    o = corpus_profile(docs, source_col=None)["overall"].collect()[0]
    # 40 docs, 21 distinct contents → dup rate ≈ 19/40 (approx_count_distinct ±1%)
    assert abs(o["approx_dup_rate"] - 19 / 40) < 0.02
