#!/usr/bin/env python3
"""A/B + stage probes: ext_cohort_retention at 100x.

Round-12 verdict item 4: the 100x row reads 3.0s = 8.1x DuckDB — the
largest unprobed multi-second ratio — with three event-scale
exchanges (user first-event agg, (user, week) distinct, the re-shuffle
feeding the attach join) and an unexercised "broadcastable when dims
allow" claim in the docstring. This script splits the wall into its
physical pieces and A/Bs the three candidate reworks.

Inputs at 100x: events = 10M rows, 150k distinct users, a handful of
distinct weeks — so `first` is 150k rows and `active` is at most
150k x n_weeks.

Variants (fresh JVM per variant — shared-JVM timings swing 1.6x+):

    shipped        — registered form: first = groupBy(user).min(ts);
                     active = (user, week) distinct; SMJ attach.
    first_agg      — stage: the user-keyed first-event aggregate alone.
    active_distinct— stage: the (user, week) distinct alone.
    scan           — stage: events scan + (user, week) project, no agg.
    bcast          — shipped with broadcast(first) hinted into the
                     attach join (150k rows x (long, date) ~ a few MB:
                     just over the 10 MB auto threshold family where
                     hints can pay — q7 lesson).
    fused          — ONE event-scale exchange: repartition(user) the
                     narrow (user, week) projection; first, active and
                     the attach join all ride that exchange via
                     subset-clustering (hashpartitioning(user)
                     satisfies ClusteredDistribution(user, week)).
    from_active    — ONE event-scale pass total: active = (user, week)
                     distinct is the only corpus-sized operation;
                     first = groupBy(user).min(week) is derived FROM
                     active (date_trunc is monotonic, so
                     trunc(min ts) == min(trunc ts) == min distinct
                     week — value-identical by construction), making
                     the corpus scanned once and every later exchange
                     active-sized (<= users x weeks).

All variants assert the same 5-row result as the shipped form at the
probe scale before timing (value identity, not just row count).

Usage (fresh JVM per variant):
    for v in shipped first_agg active_distinct scan bcast fused \
             from_active; do python scripts/bench_cohort_ab.py $v; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SCALE_DIR = os.environ.get("COHORT_AB_DIR", "/tmp/dws-scale/mult100")
REPS = 5


def _events(spark):
    from data_wrangling_spark.sources.tables import load_table

    return load_table(spark, SCALE_DIR, "events")


def _finish(cells, cohort_sizes):
    return (
        cells.join(F.broadcast(cohort_sizes), "_cohort")
        .select(
            F.col("_cohort").alias("cohort_week"),
            F.col("week_offset"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("n_cohort").cast("long").alias("n_cohort"),
            F.round(
                F.lit(1000000.0) * F.col("n_active") / F.col("n_cohort")
            )
            .cast("long")
            .alias("retention_ppm"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def build(spark, variant):
    events = _events(spark)
    week = F.date_trunc("week", F.col("ts")).cast("date")
    if variant == "scan":
        return events.select(F.col("user_id"), week.alias("_week"))
    if variant == "first_agg":
        return events.groupBy("user_id").agg(
            F.date_trunc("week", F.min("ts")).cast("date").alias("_cohort")
        )
    if variant == "active_distinct":
        return events.select(F.col("user_id"), week.alias("_week")).distinct()
    if variant == "shipped":
        from data_wrangling_spark.operators.temporal import cohort_retention

        return cohort_retention(events)
    if variant == "bcast":
        first = events.groupBy("user_id").agg(
            F.date_trunc("week", F.min("ts")).cast("date").alias("_cohort")
        )
        active = events.select(F.col("user_id"), week.alias("_week")).distinct()
        sizes = first.groupBy("_cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
        cells = (
            active.join(F.broadcast(first), "user_id")
            .select(
                "_cohort",
                (F.datediff("_week", "_cohort") / 7)
                .cast("int")
                .alias("week_offset"),
            )
            .groupBy("_cohort", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_active"))
        )
        return _finish(cells, sizes)
    if variant == "fused":
        ev = events.select(F.col("user_id"), week.alias("_week")).repartition(
            "user_id"
        )
        first = ev.groupBy("user_id").agg(F.min("_week").alias("_cohort"))
        active = ev.distinct()
        sizes = first.groupBy("_cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
        cells = (
            active.join(first, "user_id")
            .select(
                "_cohort",
                (F.datediff("_week", "_cohort") / 7)
                .cast("int")
                .alias("week_offset"),
            )
            .groupBy("_cohort", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_active"))
        )
        return _finish(cells, sizes)
    if variant in ("fused_from_active", "fused_persist_active"):
        ev = events.select(F.col("user_id"), week.alias("_week")).repartition(
            "user_id"
        )
        active = ev.distinct()
        if variant == "fused_persist_active":
            active = active.persist()
        first = active.groupBy("user_id").agg(F.min("_week").alias("_cohort"))
        sizes = first.groupBy("_cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
        cells = (
            active.join(first, "user_id")
            .select(
                "_cohort",
                (F.datediff("_week", "_cohort") / 7)
                .cast("int")
                .alias("week_offset"),
            )
            .groupBy("_cohort", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_active"))
        )
        return _finish(cells, sizes)
    if variant in ("from_active", "from_active_persist"):
        active = events.select(F.col("user_id"), week.alias("_week")).distinct()
        if variant == "from_active_persist":
            active = active.persist()
        first = active.groupBy("user_id").agg(F.min("_week").alias("_cohort"))
        sizes = first.groupBy("_cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
        cells = (
            active.join(first, "user_id")
            .select(
                "_cohort",
                (F.datediff("_week", "_cohort") / 7)
                .cast("int")
                .alias("week_offset"),
            )
            .groupBy("_cohort", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_active"))
        )
        return _finish(cells, sizes)
    raise SystemExit(f"unknown variant {variant}")


FULL_VARIANTS = {"shipped", "bcast", "fused", "from_active",
                 "fused_from_active", "fused_persist_active", "from_active_persist"}


def main() -> None:
    variant = sys.argv[1]
    from data_wrangling_spark.session import get_spark
    from data_wrangling_spark.operators.temporal import cohort_retention

    spark = get_spark(app_name=f"cohort-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")

    if variant in FULL_VARIANTS and variant != "shipped":
        want = sorted(tuple(r) for r in cohort_retention(_events(spark)).collect())
        got = sorted(tuple(r) for r in build(spark, variant).collect())
        assert got == want, f"{variant} diverges from shipped result"

    times = []
    for _ in range(REPS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = build(spark, variant)
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    times_sorted = sorted(times)
    print("COHORT_AB_JSON:" + json.dumps({
        "variant": variant,
        "median": times_sorted[len(times_sorted) // 2],
        "runs": times,
    }), flush=True)


if __name__ == "__main__":
    main()
