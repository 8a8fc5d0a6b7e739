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


def test_windowed_profile_stream_matches_batch(spark):
    """The ingest monitor: identical rows from the batch form and the
    availableNow stream over the same files."""
    import json as _json
    import shutil
    import tempfile

    from garden_net_backend_spark.plans.profile import windowed_profile

    d = tempfile.mkdtemp(prefix="profile_stream_")
    try:
        batches = [
            [
                {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog near the riverbank today", "ts": "2024-01-01T10:00:00.000"},
                {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog near the riverbank today", "ts": "2024-01-01T10:01:00.000"},
            ],
            [
                {"doc_id": 2, "text": "completely different sentence about distributed query engines and shuffles", "ts": "2024-01-01T10:06:00.000"},
                {"doc_id": 3, "text": "#### #### ####", "ts": "2024-01-01T10:07:00.000"},
            ],
        ]
        for i, rows in enumerate(batches):
            with open(f"{d}/part{i}.json", "w") as fh:
                for rec in rows:
                    fh.write(_json.dumps(rec) + "\n")
        schema = "doc_id long, text string, ts timestamp"
        batch_rows = {
            r["window_start"]: r.asDict()
            for r in windowed_profile(
                spark.read.schema(schema).json(d)
            ).collect()
        }
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(d)
        )
        q = (
            windowed_profile(stream)
            .writeStream.format("memory")
            .queryName("profile_sink")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        stream_rows = {
            r["window_start"]: r.asDict()
            for r in spark.sql("SELECT * FROM profile_sink").collect()
        }
        assert stream_rows == batch_rows
        # sanity on content: first window holds the two exact dups
        w1 = batch_rows[min(batch_rows)]
        assert w1["n_docs"] == 2 and w1["approx_distinct_content"] == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)
