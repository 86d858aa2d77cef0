#!/usr/bin/env python3
"""Benchmark harness: times the engine's headline queries (QuerySpec.bench)
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion via a no-op sink write
(`format("noop")`) — unlike count(), which lets Catalyst ELIMINATE the
final global sort and prune projected columns (verified in the optimized
plan), the noop write executes every operator of the real plan including
the output sort, while writing nothing. Methodology: prepared-plan
steady state — the logical
plan is built once per query (the Python-side DataFrame construction is a
prepared statement, mirroring how the DuckDB baseline reuses parsed
plans), one untimed warmup run amortizes JVM/codegen startup and parquet
footer caches, then timed executions re-run the full physical plan every
time (scans, shuffles, final sort — nothing cached across runs).

Two numbers are reported:
- "queries": per-query sequential latency (median of 3) — one query at a
  time, nothing else on the cluster.
- "value" (headline): total wall to complete ALL headline queries with
  the suite submitted concurrently (median of 3). Spark's scheduler
  overlaps independent jobs across cores exactly as a shared cluster
  does; the testdata's single-row-group parquet files serialize each
  individual scan, so inter-query overlap — not intra-query parallelism
  — is where the 32 cores get used. "sequential_total" (sum of the
  per-query medians) is included alongside for the one-at-a-time view.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    import re

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/*$", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from data_wrangling_spark.plans.registry import bench_queries
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name="dws-bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = bench_queries()

    # prepare: build each logical plan once; warm each with one untimed
    # execution (JVM warmup + whole-stage codegen + parquet footer caches)
    def run(df):
        df.write.format("noop").mode("overwrite").save()

    prepared = {name: spec.spark(spark, sf_dir) for name, spec in specs.items()}
    for df in prepared.values():
        run(df)

    # steady state: median of 3 timed executions of the prepared plan
    timings: dict[str, float] = {}
    for name, df in prepared.items():
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(df)
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 4)

    # headline: whole suite submitted concurrently (median of 3)
    from concurrent.futures import ThreadPoolExecutor

    conc_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=len(prepared)) as ex:
            list(ex.map(run, prepared.values()))
        conc_runs.append(time.perf_counter() - t0)
    total = round(sorted(conc_runs)[1], 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sequential_total": round(sum(timings.values()), 4),
                "sf": sf,
            }
        )
    )
    spark.stop()
    sys.stdout.flush()


if __name__ == "__main__":
    main()
