"""Corpus IO: JSONL ingest with corrupt-row capture, deterministic
training shards round trip."""

import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from garden_net_backend_spark.sources.corpus import (
    corrupt_rate,
    read_documents_jsonl,
    write_training_shards,
)


@pytest.fixture()
def jsonl_dir(tmp_path):
    rows = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web",
         "meta": {"url": "http://x"}},
        {"doc_id": 2, "text": "zweites dokument", "lang": "de", "source": "web",
         "meta": None},
    ]
    with open(tmp_path / "a.jsonl", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
        fh.write("{this is not json\n")
    # gzip member: transparency contract
    with gzip.open(tmp_path / "b.jsonl.gz", "wt") as fh:
        fh.write(json.dumps({"doc_id": 3, "text": "gzipped", "lang": "en",
                             "source": "books", "meta": {}}) + "\n")
    return str(tmp_path)


def test_jsonl_ingest_and_corrupt_capture(spark, jsonl_dir):
    # cache() is REQUIRED before corrupt-column-only queries
    # (Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction)
    docs = read_documents_jsonl(spark, jsonl_dir).cache()
    rows = {r["doc_id"]: r for r in docs.collect() if r["doc_id"] is not None}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["meta"]["url"] == "http://x"
    assert rows[3]["text"] == "gzipped"          # gzip transparency
    bad = docs.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]
    assert abs(corrupt_rate(docs) - 0.25) < 1e-9


def test_training_shards_round_trip(spark, tmp_path):
    seqs = spark.createDataFrame(
        [(f"src{i % 3}", i, i // 4, i % 16, 16) for i in range(400)],
        "source string, doc_id long, seq_id long, tok_begin long, n_tokens_in_seq long",
    )
    out = str(tmp_path / "shards")
    write_training_shards(seqs, out, n_shards=8)
    # deterministic partition layout: shard dirs 0..7
    dirs = sorted(
        d for d in os.listdir(out) if d.startswith("shard=")
    )
    assert dirs == [f"shard={i}" for i in range(8)]
    back = spark.read.parquet(out)
    assert back.count() == 400
    # assignment is pure math: shard == seq_id % 8 on every row
    assert back.filter(F.col("shard") != F.col("seq_id") % 8).count() == 0
    # writing again yields identical shard membership (reproducibility)
    out2 = str(tmp_path / "shards2")
    write_training_shards(seqs, out2, n_shards=8)
    a = {tuple(r) for r in spark.read.parquet(out).collect()}
    b = {tuple(r) for r in spark.read.parquet(out2).collect()}
    assert a == b
