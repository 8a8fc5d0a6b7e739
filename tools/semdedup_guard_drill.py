"""Measured drill for the round-9 SemDeDup hot-cell guard (judge r8
task 1): a planted mega-cell — the corpus shape the guard exists for —
must complete bounded, keep the duplicate mass one connected
component, and the facts go to SCALING_RAW_SEMDEDUP_GUARD.json.

Scenario: "stale index + duplicate flood". Cells are learned/seeded on
yesterday's corpus (background directions only); today's crawl brings
a 30% near-identical mass (mirror flood). Every flood vector lands in
ONE Voronoi cell, so the unguarded within-cell all-pairs join goes
|mass|²/2 — at 30k that is ~450M exact-decimal rescores before the
prescreen even sees them. The guard's distance-rank chunking bounds
candidates to ~2·|mass|·cap and CC dedup still recovers the full
cluster (adjacent-chunk links chain).

Counts are load-independent; wall times are stamped with the 1-min
loadavg like the other drills.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from garden_net_backend_spark.operators.dedup import dedup_representatives
from garden_net_backend_spark.operators.similarity import (
    _ivf_assign,
    semantic_dedup_pairs,
)
from garden_net_backend_spark.session import get_session

# Sizing note: the guard bounds CANDIDATE volume (2·sz·cap vs sz²);
# emitted-pair volume is threshold-driven — a near-identical mass
# emits essentially every candidate it is shown, so the drill keeps
# the mass at 10k (guarded candidates ≈ 2M, exact-rescored in ~1 min)
# where the UNGUARDED within-cell join would be 50M pairs — 25× the
# candidate volume, all of it surviving to the exact-decimal rescore.
N_BG = 70_000
N_DUP = 10_000
DIM = 32
K_CELLS = 283  # ≈ sqrt(N) production sizing
CAP = 100
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALING_RAW_SEMDEDUP_GUARD.json",
)


def main() -> None:
    spark = get_session("semdedup-guard-drill")
    rng = np.random.default_rng(42)
    bg = rng.standard_normal((N_BG, DIM))
    bg /= np.linalg.norm(bg, axis=1, keepdims=True)
    hub = rng.standard_normal(DIM)
    dup = hub + rng.standard_normal((N_DUP, DIM)) * 1e-3
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": np.concatenate(
                [np.arange(N_BG), np.arange(1_000_000, 1_000_000 + N_DUP)]
            ),
            "embedding": [r.astype(np.float32).tolist() for r in np.vstack([bg, dup])],
        }
    )
    corpus = spark.createDataFrame(pdf).repartition(32).persist()
    corpus.count()
    # stale cells: the K lowest-id (background-only) vectors
    cells = (
        corpus.orderBy("vec_id")
        .limit(K_CELLS)
        .select(
            F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
        )
        .persist()
    )
    cells.count()

    facts: dict = {
        "n_vectors": N_BG + N_DUP,
        "n_planted_dup_mass": N_DUP,
        "dim": DIM,
        "k_cells": K_CELLS,
        "max_cell_size_cap": CAP,
        "rev": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(OUT),
        ).stdout.strip(),
    }

    # cell histogram → the mega-cell + analytic unguarded volume.
    # Arrow assignment (the production path — the exact-decimal argmax
    # is the O(N·k) interpreted fold the round-8 drill measured at
    # 868s for k=448).
    cent_rows = [
        (r["cell_id"], list(r["centroid"])) for r in cells.collect()
    ]
    assign = _ivf_assign(corpus, cent_rows, "vec_id", "embedding")
    hist = (
        assign.groupBy("centroid_id").agg(F.count("*").alias("sz")).toPandas()
    )
    facts["n_cells_used"] = int(len(hist))
    facts["max_cell_size"] = int(hist["sz"].max())
    facts["median_cell_size"] = float(hist["sz"].median())
    facts["unguarded_within_cell_pairs"] = int(
        (hist["sz"] * (hist["sz"] - 1) // 2).sum()
    )
    facts["guarded_candidate_bound"] = int((2 * hist["sz"] * CAP).sum())

    t0 = time.time()
    guarded = semantic_dedup_pairs(
        corpus,
        threshold=0.95,
        cells=cells,
        assign="arrow",
        max_cell_size=CAP,
        hot_mode="split",
    ).persist()
    n_pairs = guarded.count()
    facts["guarded_pairs_emitted"] = int(n_pairs)
    facts["guarded_wall_sec"] = round(time.time() - t0, 2)
    facts["loadavg_1m"] = round(os.getloadavg()[0], 1)

    # CC connectivity: the full planted mass must collapse to ONE rep
    t0 = time.time()
    reps = dedup_representatives(
        corpus.select("vec_id"), guarded, id_col="vec_id"
    )
    planted = reps.filter(F.col("vec_id") >= 1_000_000)
    facts["planted_components"] = int(
        planted.select(F.countDistinct("representative")).collect()[0][0]
    )
    facts["planted_rows"] = int(planted.count())
    facts["cc_wall_sec"] = round(time.time() - t0, 2)
    guarded.unpersist()

    with open(OUT, "w") as fh:
        json.dump(facts, fh, indent=1, sort_keys=True)
    print(json.dumps(facts, sort_keys=True))


if __name__ == "__main__":
    main()
