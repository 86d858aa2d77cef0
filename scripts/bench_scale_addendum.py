#!/usr/bin/env python3
"""Addendum scale rows for queries registered AFTER a round's main
bench_scale regeneration launched: times the named queries at the same
scale points with the SAME methodology (prepared plans, warmup,
median-of-3 noop sink; DuckDB temp-table sink) against the already-
materialized /tmp/dws-scale dirs, and prints markdown rows matching
SCALING.md's extras table so they can be appended as a labeled
addendum subsection.

Usage: python scripts/bench_scale_addendum.py q1 q2 ... [--mults 10,20,100]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import bench_scale as BS
    from data_wrangling_spark.plans.registry import QUERIES, _load_all
    from data_wrangling_spark.session import get_spark

    _load_all()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mults = [10, 20, 100]
    for a in sys.argv[1:]:
        if a.startswith("--mults"):
            mults = [int(m) for m in a.split("=", 1)[1].split(",")]
    names = args
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        raise SystemExit(2)
    specs = {n: QUERIES[n] for n in names}
    workdir = os.environ.get("SPARK_GRAFT_SCALE_WORKDIR", "/tmp/dws-scale")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dws-bench-scale-addendum")
    spark.sparkContext.setLogLevel("ERROR")

    scales = [
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
    ] + [(f"{m}x sf0.1", os.path.join(workdir, f"mult{m}")) for m in mults]
    results: dict[str, dict[str, float]] = {}
    duck: dict[str, dict[str, float]] = {}
    for label, d in scales:
        results[label], _ = BS.time_suite(spark, specs, d, conc=False)
        duck[label] = BS.duckdb_time_suite(specs, d, threads=cpus, sink="table")
        print(f"{label}: spark={results[label]} duckdb={duck[label]}",
              file=sys.stderr)

    base, top = scales[1][0], scales[-1][0]
    print(f"| query | " + " | ".join(s for s, _ in scales)
          + f" | {top} / {base} time | DuckDB {top} | Spark/DuckDB {top} |")
    print("|---|" + "---|" * (len(scales) + 3))
    for n in names:
        r = [results[s][n] for s, _ in scales]
        ratio = r[-1] / r[1] if r[1] else float("nan")
        d_t = duck[top].get(n)
        print(f"| {n} | " + " | ".join(f"{x:.3f}" for x in r)
              + f" | {ratio:.1f}x | {d_t:.3f} | {r[-1] / d_t:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
