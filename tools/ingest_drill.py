"""Per-batch cost drill for the streaming ingest loop
(streaming/ingest.py): feed N batches of B docs (with planted
near-dups of earlier batches) through process_ingest_batch and record
each batch's wall time against the growing accepted corpus — the claim
under test is that a batch pays for ITS OWN size plus one
partition-prunable probe of the banded index, not for the corpus, so
per-batch wall should stay ~flat as the index grows. A
``compact_ingest_index`` run lands mid-drill (after COMPACT_AFTER) so
the record also shows the probe wall flat ACROSS a compaction
boundary (judge r10 task 2: per-batch ``ingest_batch=`` partitions ×
small files must not bury the pruning). Per-batch decide/write walls
come from the loop's own metrics frame (``<accepted>_metrics``), not
ad-hoc timers. Writes SCALING_RAW_INGEST.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garden_net_backend_spark.session import get_session
from garden_net_backend_spark.streaming.ingest import (
    compact_ingest_index,
    process_ingest_batch,
    process_ingest_batch_curation,
    process_ingest_batch_lines,
    process_ingest_batch_substring,
)

N_BATCHES = 8
DOCS_PER_BATCH = 250
DUP_FRACTION = 0.2  # of each batch duplicates an earlier batch's doc
COMPACT_AFTER = 3  # compact index+corpus once this batch has landed
FAMILY = "minhash"
if "--family=substring" in sys.argv:
    FAMILY = "substring"
elif "--family=line" in sys.argv:
    FAMILY = "line"
elif "--family=curation" in sys.argv:
    FAMILY = "curation"
elif "--family=curation-quality" in sys.argv:
    # the composed face with the round-12 stage-0 quality filter ON and
    # a planted junk fraction — proves the extra stage adds a
    # shard-sized filter, not a new per-batch scaling term
    FAMILY = "curation-quality"
JUNK_FRACTION = 0.15  # of each batch fails the quality rule (curation-quality)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    {
        "minhash": "SCALING_RAW_INGEST.json",
        "substring": "SCALING_RAW_INGEST_SUBSTRING.json",
        "line": "SCALING_RAW_INGEST_LINE.json",
        "curation": "SCALING_RAW_INGEST_CURATION.json",
        "curation-quality": "SCALING_RAW_INGEST_CURATION_QUALITY.json",
    }[FAMILY],
)


def _text(b: int, i: int) -> str:
    return " ".join(f"b{b:02d}d{i:03d}w{j:02d}" for j in range(60))


def main() -> None:
    spark = get_session("ingest-drill")
    spark.range(0, 1 << 15, 1, spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, "id long"
    ).count()
    work = tempfile.mkdtemp(prefix="ingest_drill_")
    accepted_dir, index_dir = f"{work}/acc", f"{work}/idx"
    if FAMILY == "minhash":
        kw = dict(threshold=0.7, ngram=3, shingle="word",
                  num_hashes=64, bands=16)
        step = process_ingest_batch
    elif FAMILY == "substring":
        # the substring face: dup slots share a 50-word prefix with
        # batch 0's doc (≥ min_tokens), so those spans get excised
        kw = dict(min_tokens=20)
        step = process_ingest_batch_substring
    elif FAMILY == "line":
        # the line face: the drill text has no newlines — treat every
        # 'w'-boundary word group as one 'line' by splitting on spaces
        # (every repeated 60-word doc then repeats line-wise)
        kw = dict(sep=" ", min_chars=1)
        step = process_ingest_batch_lines
    else:
        # the composed face (gate -> line -> substring): minhash gate
        # rejects the dup slots; line/substring stages pay their
        # stored-index scans on the survivors — the drill measures the
        # SUM of the three contracts staying flat per batch
        kw = dict(
            threshold=0.7, ngram=3, shingle="word", num_hashes=64,
            bands=16, sep=" ", min_chars=1, min_tokens=20,
        )
        if FAMILY == "curation-quality":
            from pyspark.sql import functions as F

            # round 12: stage-0 quality ON — junk rows (planted short)
            # must be dropped BEFORE the gate and never touch an index
            kw["quality_rules"] = lambda c: F.length(c) >= 100

        def step(df, b, accepted_dir, index_dir, **kw):
            process_ingest_batch_curation(
                df, b, accepted_dir, index_dir + "_mh",
                index_dir + "_lidx", index_dir + "_widx", **kw
            )
    facts: dict = {
        "family": FAMILY,
        "n_batches": N_BATCHES,
        "docs_per_batch": DOCS_PER_BATCH,
        "dup_fraction": DUP_FRACTION,
        "compact_after_batch": COMPACT_AFTER,
        "rev": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(OUT),
        ).stdout.strip(),
        "batches": [],
    }
    try:
        n_dup = int(DOCS_PER_BATCH * DUP_FRACTION)
        for b in range(N_BATCHES):
            rows = []
            for i in range(DOCS_PER_BATCH):
                doc_id = b * DOCS_PER_BATCH + i
                if b > 0 and i < n_dup:
                    # near-dup of the same slot in batch 0: replace the
                    # last 10 of 60 words → J ≈ 50/70 ≈ 0.71 ≥ τ
                    words = _text(0, i).split()
                    text = " ".join(
                        words[:50] + [f"v{b:02d}x{j}" for j in range(10)]
                    )
                else:
                    text = _text(b, i)
                if (
                    FAMILY == "curation-quality"
                    and i >= DOCS_PER_BATCH - int(DOCS_PER_BATCH * JUNK_FRACTION)
                ):
                    text = f"junk b{b:02d}d{i:03d}"  # fails length >= 100
                rows.append((doc_id, text, "crawl"))
            df = spark.createDataFrame(
                rows, "doc_id long, text string, source string"
            )
            load = round(os.getloadavg()[0], 1)
            t0 = time.time()
            step(df, b, accepted_dir, index_dir, **kw)
            wall = round(time.time() - t0, 2)
            n_acc = spark.read.parquet(accepted_dir).count()
            rec = {"batch": b, "wall_sec": wall, "accepted_total": n_acc,
                   "loadavg_1m": load}
            if b == COMPACT_AFTER:
                tc = time.time()
                if FAMILY.startswith("curation"):
                    for d in ("_mh", "_lidx", "_widx"):
                        compact_ingest_index(spark, index_dir + d)
                else:
                    compact_ingest_index(spark, index_dir)
                compact_ingest_index(spark, accepted_dir)
                rec["compaction_sec"] = round(time.time() - tc, 2)
            facts["batches"].append(rec)
            print(f"batch {b}: {wall}s  corpus {n_acc}  load {load}"
                  + ("  [compacted]" if "compaction_sec" in rec else ""),
                  flush=True)
        # fold in the loop's own per-batch metrics (decide/write split)
        # — keyed by src_batch, the id that SURVIVES compaction
        # (ingest_batch collapses to -1 if the metrics dir is ever
        # folded by compact_ingest_index, which its docstring blesses)
        m = {
            int(r["src_batch"]): r.asDict()
            for r in spark.read.parquet(accepted_dir + "_metrics").collect()
        }
        for rec in facts["batches"]:
            mm = m.get(rec["batch"])
            if mm:
                rec["decide_sec"] = mm["decide_sec"]
                rec["write_sec"] = mm["write_sec"]
                rec["n_accepted"] = mm["n_accepted"]
                rec["n_rejected"] = mm["n_rejected"]
        walls = [x["wall_sec"] for x in facts["batches"]]
        facts["first_batch_sec"] = walls[0]
        facts["last_batch_sec"] = walls[-1]
        facts["max_over_min_after_warm"] = round(
            max(walls[1:]) / max(min(walls[1:]), 1e-9), 2
        )
        pre = [x["wall_sec"] for x in facts["batches"][1:COMPACT_AFTER + 1]]
        post = [x["wall_sec"] for x in facts["batches"][COMPACT_AFTER + 1:]]
        facts["mean_batch_sec_pre_compaction"] = round(sum(pre) / len(pre), 2)
        facts["mean_batch_sec_post_compaction"] = round(sum(post) / len(post), 2)
        with open(OUT, "w") as fh:
            json.dump(facts, fh, indent=1)
        print(json.dumps(facts, indent=None, sort_keys=True))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
