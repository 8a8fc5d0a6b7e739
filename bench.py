"""Benchmark runner: executes the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full query wall time including the collect (results are small
aggregates; row-returning queries are counted, not collected, so the
measurement is engine time, not driver materialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from garden_net_backend_spark.queries import CATALOG
from garden_net_backend_spark.session import get_session

# queries that return a large row set → time .count() instead of .collect()
_COUNT_ONLY_ABOVE = 100_000


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_session("bench")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not first-touch overheads
    CATALOG["q01_pricing_summary"].spark_fn(spark, sf_dir).collect()
    # ... and the Python/Arrow worker pool: the first mapInPandas in a
    # session forks one worker per core, each importing pandas+numpy
    # (~3s at 32 cores) — a session-level first-touch cost, not a
    # per-query one
    spark.range(
        0, 1 << 15, 1, spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    def run_once(spec) -> float:
        t0 = time.time()
        df = spec.spark_fn(spark, sf_dir)
        # one execution: cache, count, then materialize to the driver
        # only when the result is driver-sized
        df.persist()
        try:
            n = df.count()
            if n <= _COUNT_ONLY_ABOVE:
                df.collect()
        finally:
            df.unpersist()
        elapsed = round(time.time() - t0, 3)
        # release py4j refs (outside the timed window) so the
        # ContextCleaner can drop the localCheckpoint blocks iterative
        # operators pin (otherwise they accumulate across the run and
        # skew later query timings)
        del df
        import gc

        gc.collect()
        return elapsed

    # Two full interleaved passes, min per query: the machine is shared
    # and sibling-container load arrives in bursts longer than one
    # query, so back-to-back repeats can both absorb the same spike —
    # separating a query's two samples by a whole catalog pass
    # decorrelates them. The second pass also excludes first-touch
    # costs (JIT, parquet footer cache). Queries whose first sample is
    # already long skip the repeat to bound total bench wall time.
    _TOTAL_BUDGET_SEC = 600.0  # stop refining once the bench budget is
    # spent (keeps the driver's bench step bounded even under heavy
    # sibling-host load). Every query gets a repeat while budget lasts
    # — a per-query skip for slow first samples would pin exactly the
    # samples a load burst inflated.
    # Attribution under shared load: persist EVERY sample plus the
    # 1-minute host loadavg captured just before it, so a reader can
    # separate plan regressions (both samples slow, load quiet) from
    # sibling-container bursts (one sample slow, load spiking).
    t_start = time.time()
    samples: dict[str, list[float]] = {name: [] for name in CATALOG}
    loads: dict[str, list[float]] = {name: [] for name in CATALOG}

    def sample(name, spec) -> None:
        loads[name].append(round(os.getloadavg()[0], 1))
        samples[name].append(run_once(spec))

    for name, spec in CATALOG.items():
        sample(name, spec)
    for name, spec in CATALOG.items():
        if time.time() - t_start > _TOTAL_BUDGET_SEC:
            break
        sample(name, spec)

    timings = {name: min(s) for name, s in samples.items()}
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "samples": samples,
                "loadavg_1m_before_sample": loads,
            }
        )
    )


if __name__ == "__main__":
    main()
