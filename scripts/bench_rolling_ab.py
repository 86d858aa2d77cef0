#!/usr/bin/env python3
"""A/B probe: ext_rolling_event_features terminal sort at 100x.

Round-13: the 100x row reads 3.14s = 3.0x DuckDB. The query's output is
EVENT-scale (10M rows at 100x) and ends with a global orderBy(event_id)
— a range-partitioned sort whose sampling pass re-executes the window
upstream (the round-12 snapshot_diff find). The driver's value-hash
compare sorts rows by construction, and a 100 TB feature feed is
consumed keyed, never globally ordered — the same argument that
removed snapshot_diff's sort ON BOTH ENGINES in round 12. The
boilerplate_removal counter-lesson (its orderBy measured FREE) says:
probe, don't pattern-match.

Variants:
    shipped — registered form (window + global sort).
    nosort  — identical window, no terminal orderBy.
    window  — alias of nosort (stage = the window itself).
    scan    — events scan of the 4 referenced columns.

Usage:
    for v in shipped nosort scan; do python scripts/bench_rolling_ab.py $v; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # match the extras workers

from pyspark.sql import functions as F  # noqa: E402

SCALE_DIR = os.environ.get("ROLLING_AB_DIR", "/tmp/dws-scale/mult100")
REPS = 5


def build(spark, variant):
    from data_wrangling_spark.operators.temporal import (
        trailing_window_features,
    )
    from data_wrangling_spark.sources.tables import load_table

    events = load_table(spark, SCALE_DIR, "events").select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("value_cents"),
    )
    if variant == "scan":
        return events
    out = trailing_window_features(
        events, on="user_id", time_col="ts", window_seconds=7 * 86400,
        exprs={
            "n_7d": F.count(F.lit(1)),
            "sum_7d_cents": F.sum("value_cents"),
        },
    ).select("event_id", "user_id", "ts", "n_7d", "sum_7d_cents")
    if variant == "shipped":
        return out.orderBy("event_id")
    if variant in ("nosort", "window"):
        return out
    raise SystemExit(f"unknown variant {variant}")


def main() -> None:
    variant = sys.argv[1]
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name=f"rolling-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    times = []
    for _ in range(REPS + 1):
        spark.catalog.clearCache()
        df = build(spark, variant)
        t0 = time.perf_counter()
        sc.setJobDescription(f"rolling-ab {variant}")
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    sc.setJobDescription(None)
    warm = sorted(times[1:])
    print(json.dumps({
        "variant": variant, "dir": SCALE_DIR, "times": times,
        "median_after_warmup": warm[len(warm) // 2],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
