#!/usr/bin/env python3
"""Benchmark harness: times the engine's headline queries (QuerySpec.bench)
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion via a count over the full result
(df.write would add sink cost; count forces every operator including the
final sort/limit). One untimed warmup run amortizes JVM/codegen startup so
the numbers reflect steady-state plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from data_wrangling_spark.plans.registry import bench_queries
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name="dws-bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = bench_queries()

    # warmup: run each query's real action once (JVM warmup + whole-stage
    # codegen compilation + parquet footer caches), untimed
    for spec in specs.values():
        spec.spark(spark, sf_dir).count()

    # steady state: median of 3 runs per query
    timings: dict[str, float] = {}
    for name, spec in specs.items():
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()
    sys.stdout.flush()


if __name__ == "__main__":
    main()
