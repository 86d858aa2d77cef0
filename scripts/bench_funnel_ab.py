#!/usr/bin/env python3
"""A/B + stage probes: ext_funnel_steps at 100x.

Round-13: the 100x row reads 2.61s = 4.0x DuckDB (its 10x row was
round-12 solo-contamination, separately re-amended). The funnel plan
unions per-step counts whose stage relations CHAIN: stage_i is both
counted (part_i) and consumed by stage_{i+1} — each union branch
re-derives every earlier stage unless ReuseExchange dedups the
identical aggregate subtrees, and each stage scans events again with a
different pushed type filter. Two candidates, cohort-lesson shaped:

    shipped  — registered form.
    persist  — persist each stage relation (user-level, tiny: <=150k
               rows) so later branches read it instead of re-deriving.
    fused    — ONE event-scale exchange: filter events to the step set,
               repartition by user, let the three per-step aggregates
               and user-keyed joins ride that exchange.
    stage1   — stage: the step-1 filtered aggregate alone.
    scan     — stage: events scan of (user_id, event_type, ts).

Full variants assert value-identity vs shipped before timing.

Usage:
    for v in shipped persist fused stage1 scan; do \
        python scripts/bench_funnel_ab.py $v; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # match the extras workers

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

SCALE_DIR = os.environ.get("FUNNEL_AB_DIR", "/tmp/dws-scale/mult100")
REPS = 5
STEPS = ["view", "click", "purchase"]  # the registered query's steps


def _events(spark):
    from data_wrangling_spark.sources.tables import load_table

    return load_table(spark, SCALE_DIR, "events")


def _finish(parts):
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionAll(p)
    w = Window.orderBy("step_idx")
    return allc.select(
        "step_idx",
        "step",
        "n_users",
        F.when(
            F.lag("n_users").over(w).isNull() | (F.lag("n_users").over(w) == 0),
            F.when(F.col("step_idx") == 1, F.lit(1000000)).otherwise(F.lit(0)),
        )
        .otherwise(
            F.round(
                F.lit(1000000.0) * F.col("n_users") / F.lag("n_users").over(w)
            ).cast("long")
        )
        .cast("long")
        .alias("conv_ppm"),
    ).orderBy("step_idx")


def _chain(events, persist=False):
    stage = (
        events.filter(F.col("event_type") == STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("_t"))
    )
    if persist:
        stage = stage.persist()
    parts = []
    for i, step in enumerate(STEPS):
        if i:
            stage = (
                events.filter(F.col("event_type") == step)
                .join(stage.withColumnRenamed("_t", "_prev"), "user_id")
                .filter(F.col("ts") > F.col("_prev"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("_t"))
            )
            if persist:
                stage = stage.persist()
        parts.append(
            stage.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("step_idx"),
                F.lit(step).alias("step"),
                F.col("n_users").cast("long").alias("n_users"),
            )
        )
    return _finish(parts)


def build(spark, variant):
    events = _events(spark)
    if variant == "scan":
        return events.select("user_id", "event_type", "ts")
    if variant == "stage1":
        return (
            events.filter(F.col("event_type") == STEPS[0])
            .groupBy("user_id")
            .agg(F.min("ts").alias("_t"))
        )
    if variant == "shipped":
        from data_wrangling_spark.operators.temporal import funnel_steps

        return funnel_steps(events, STEPS)
    if variant == "persist":
        return _chain(events, persist=True)
    if variant == "fused":
        ev = (
            events.filter(F.col("event_type").isin(STEPS))
            .select("user_id", "event_type", "ts")
            .repartition("user_id")
        )
        return _chain(ev, persist=False)
    raise SystemExit(f"unknown variant {variant}")


FULL = {"shipped", "persist", "fused"}


def main() -> None:
    variant = sys.argv[1]
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name=f"funnel-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    if variant in FULL and variant != "shipped":
        want = [tuple(r) for r in build(spark, "shipped").collect()]
        got = [tuple(r) for r in build(spark, variant).collect()]
        assert got == want, f"{variant} diverges from shipped result"
        spark.catalog.clearCache()

    times = []
    for _ in range(REPS + 1):
        spark.catalog.clearCache()
        df = build(spark, variant)
        t0 = time.perf_counter()
        sc.setJobDescription(f"funnel-ab {variant}")
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
