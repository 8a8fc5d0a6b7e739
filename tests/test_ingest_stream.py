"""Streaming ingest-with-dedup loop (streaming/ingest.py): a crawl
feed drained one file per micro-batch must accept first-seen content,
reject near-dups of ACCEPTED docs, collapse within-batch clusters to
the min id, NOT propagate chains through rejected docs, and converge
under foreachBatch replay (at-least-once)."""

import json
import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from garden_net_backend_spark.streaming.ingest import (
    ingest_dedup_stream,
    process_ingest_batch,
)


def _doc(i: int, words) -> dict:
    return {"doc_id": i, "text": " ".join(words), "source": "crawl"}


@pytest.fixture()
def feed(spark):
    """Three files → three micro-batches with planted relationships:

    file0: doc 0 (base A), doc 1 (base B)           → accept 0, 1
    file1: doc 2 = near-dup of 0                     → reject (rule 1)
           doc 3 (base C), doc 4 = near-dup of 3     → accept 3 (min id),
                                                       reject 4 (rule 2)
    file2: doc 5 = near-dup of 1                     → reject (rule 1)
           doc 6 = near-dup of REJECTED 2's unique tail, far from 0
                                                     → ACCEPT (chains do
                                                       not propagate)
           doc 7 (base D)                            → accept
    """
    base_a = [f"alpha{j:02d}" for j in range(40)]
    base_b = [f"bravo{j:02d}" for j in range(40)]
    base_c = [f"charl{j:02d}" for j in range(40)]
    base_d = [f"delta{j:02d}" for j in range(40)]
    tail = [f"tail{j:02d}" for j in range(12)]
    files = [
        [_doc(0, base_a), _doc(1, base_b)],
        [
            _doc(2, base_a[:36] + tail[:4]),          # J(2,0) ≈ 0.82
            _doc(3, base_c),
            _doc(4, base_c[:37] + ["mut1", "mut2", "mut3"]),  # J(4,3) ≈ 0.86
        ],
        [
            _doc(5, base_b[:36] + ["x1", "x2", "x3", "x4"]),  # J(5,1) ≈ 0.82
            # near 2's tail-augmented form but far from 0: shares 2's
            # tail plus fresh words — J(6,0) small, J(6,2) moderate
            _doc(6, tail + [f"fresh{j:02d}" for j in range(28)]),
            _doc(7, base_d),
        ],
    ]
    d = tempfile.mkdtemp(prefix="ingest_feed_")
    for i, docs in enumerate(files):
        with open(f"{d}/f{i}.json", "w") as fh:
            for rec in docs:
                fh.write(json.dumps(rec) + "\n")
        # distinct mtimes keep the file-source discovery order stable
        t = time.time() - 30 + i
        os.utime(f"{d}/f{i}.json", (t, t))
    yield d
    shutil.rmtree(d, ignore_errors=True)


KW = dict(threshold=0.7, ngram=3, shingle="word", num_hashes=64, bands=16)


def test_ingest_stream_accepts_and_rejects(spark, feed):
    work = tempfile.mkdtemp(prefix="ingest_out_")
    accepted_dir = f"{work}/accepted"
    index_dir = f"{work}/index"
    try:
        stream = (
            spark.readStream.schema("doc_id long, text string, source string")
            .option("maxFilesPerTrigger", 1)
            .json(feed)
        )
        q = ingest_dedup_stream(
            stream, accepted_dir, index_dir, f"{work}/ckpt", **KW
        )
        q.awaitTermination(300)
        assert q.exception() is None, q.exception()
        got = spark.read.parquet(accepted_dir)
        ids = {r["doc_id"] for r in got.select("doc_id").collect()}
        assert ids == {0, 1, 3, 6, 7}
        # batch column records provenance; one partition per micro-batch
        batches = {
            r["doc_id"]: r["ingest_batch"]
            for r in got.select("doc_id", "ingest_batch").collect()
        }
        assert batches[0] == batches[1] < batches[3] < batches[6]
        # the index holds BANDED rows for exactly the accepted docs
        idx = spark.read.parquet(index_dir)
        assert {r["id"] for r in idx.select("id").collect()} == ids
        per_doc = idx.groupBy("id").count().select("count").distinct().collect()
        assert [r["count"] for r in per_doc] == [16]  # one row per band
        # invariant: no near-dup pair is left WITHIN the accepted corpus
        from garden_net_backend_spark.operators.dedup import minhash_dedup_pairs

        assert (
            minhash_dedup_pairs(
                got.select("doc_id", "text"), **KW
            ).count()
            == 0
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_ingest_replay_is_idempotent(spark, feed):
    """foreachBatch is at-least-once: re-running a committed batch id
    must reproduce the identical accepted set and index (dynamic
    partition overwrite + decisions against the pre-batch prefix)."""
    work = tempfile.mkdtemp(prefix="ingest_replay_")
    accepted_dir = f"{work}/accepted"
    index_dir = f"{work}/index"
    try:
        docs = spark.read.schema("doc_id long, text string, source string").json(
            feed
        )
        f0 = docs.filter(F.col("doc_id") < 2)
        f1 = docs.filter(F.col("doc_id").between(2, 4))
        process_ingest_batch(f0, 0, accepted_dir, index_dir, **KW)
        process_ingest_batch(f1, 1, accepted_dir, index_dir, **KW)
        before = sorted(
            map(tuple, spark.read.parquet(accepted_dir).orderBy("doc_id").collect())
        )
        # replay batch 1 (same id, same data) — must converge, not grow
        process_ingest_batch(f1, 1, accepted_dir, index_dir, **KW)
        after = sorted(
            map(tuple, spark.read.parquet(accepted_dir).orderBy("doc_id").collect())
        )
        assert after == before
        idx = spark.read.parquet(index_dir)
        assert {r["id"] for r in idx.select("id").collect()} == {0, 1, 3}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_semantic_ingest_loop(spark):
    """The embedding face of the loop: stored (id, cell) assignments as
    the index, SemDeDup incremental as the emitter, same accept rules
    and replay idempotency."""
    import numpy as np

    from garden_net_backend_spark.streaming.ingest import (
        ingest_dedup_stream_semantic,
        process_ingest_batch_semantic,
    )

    rng = np.random.default_rng(31)
    dirs = rng.standard_normal((6, 16))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    def vec(k, eps=0.0):
        v = dirs[k] + rng.standard_normal(16) * eps
        return (v / np.linalg.norm(v)).tolist()

    # batch 0: ids 0 (dir0), 1 (dir1) → accept both
    # batch 1: 2 = near-dup of 0 → reject; 3 (dir2) and 4 ≈ 3 → keep 3
    # batch 2: 5 ≈ 1 → reject; 6 (dir3) → accept
    b0 = [(0, vec(0)), (1, vec(1))]
    b1 = [(2, vec(0, 1e-3)), (3, vec(2)), (4, vec(2, 1e-3))]
    b2 = [(5, vec(1, 1e-3)), (6, vec(3))]
    schema = "vec_id long, embedding array<float>"
    cells = spark.createDataFrame(
        [(i, dirs[i].tolist()) for i in range(6)],
        "cell_id long, centroid array<float>",
    )
    import json as _json
    import os
    import tempfile
    import time

    feed = tempfile.mkdtemp(prefix="semfeed_")
    for i, rows in enumerate([b0, b1, b2]):
        with open(f"{feed}/f{i}.json", "w") as fh:
            for vid, emb in rows:
                fh.write(_json.dumps({"vec_id": vid, "embedding": emb}) + "\n")
        t = time.time() - 30 + i
        os.utime(f"{feed}/f{i}.json", (t, t))
    work = tempfile.mkdtemp(prefix="semingest_")
    acc, asg = f"{work}/acc", f"{work}/asg"
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(feed)
        )
        q = ingest_dedup_stream_semantic(
            stream, acc, asg, f"{work}/ckpt", cells, threshold=0.99
        )
        q.awaitTermination(300)
        assert q.exception() is None, q.exception()
        got = spark.read.parquet(acc)
        ids = {r["vec_id"] for r in got.select("vec_id").collect()}
        assert ids == {0, 1, 3, 6}
        # the assignment index covers exactly the accepted vectors and
        # maps each to its true cell
        asgn = {
            r["vec_id"]: r["_cell"]
            for r in spark.read.parquet(asg).collect()
        }
        assert set(asgn) == ids
        assert asgn[0] == 0 and asgn[1] == 1 and asgn[3] == 2 and asgn[6] == 3
        # replay idempotency for the semantic body
        docs = spark.read.schema(schema).json(feed)
        before = sorted(r["vec_id"] for r in got.collect())
        process_ingest_batch_semantic(
            docs.filter(F.col("vec_id").between(2, 4)), 1, acc, asg, cells,
            threshold=0.99,
        )
        after = sorted(
            r["vec_id"] for r in spark.read.parquet(acc).collect()
        )
        assert after == before
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(feed, ignore_errors=True)
