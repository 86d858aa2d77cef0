#!/usr/bin/env python3
"""A/B + stage probes: ext_tpch_q11_important_parts at 100x.

Round-13: the 100x row reads 4.21s = 2.0x DuckDB with no probe. The
plan builds the derived partsupp catalog (ONE groupBy over 60M lineitem
rows) and only THEN semi-filters it to ASIA suppliers via a broadcast
join. The ASIA filter is on ps_suppkey — a GROUPING key — so filtering
lineitem BEFORE the aggregate keeps every surviving (partkey, suppkey)
group bit-identical (min/sum over exactly the same rows) while dropping
~4/5 of the aggregate's input (5 regions, uniform suppliers). Guide
§3.2: reduce the big side before shuffling it.

Variants (fresh JVM per variant):

    shipped    — registered form: full partsupp agg, then ASIA filter.
    pushdown   — broadcast-semi-join lineitem to ASIA suppliers BEFORE
                 the (partkey, suppkey) aggregate; rest unchanged.
    val_full   — stage: the full partsupp aggregate alone (no filter).
    val_asia   — stage: the pushed-down aggregate alone.
    li_scan    — stage: lineitem scan of the 4 referenced columns.

Full variants assert value-identity vs shipped before timing.

Usage:
    for v in shipped pushdown val_full val_asia li_scan; do \
        python scripts/bench_q11_ab.py $v; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # match the extras workers

from pyspark.sql import functions as F  # noqa: E402

SCALE_DIR = os.environ.get("Q11_AB_DIR", "/tmp/dws-scale/mult100")
REPS = 5


def _q11_tail(val):
    tot = val.agg(F.sum("value_cents").cast("bigint").alias("_total_cents"))
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("value_cents") * 1000 > F.col("_total_cents"))
        .select(
            "p_partkey",
            (F.col("value_cents") / F.lit(100.0)).alias("part_value"),
        )
        .orderBy(F.desc("value_cents"), "p_partkey")
    )


def build(spark, variant):
    from data_wrangling_spark.plans.scale_queries import (
        _derived_partsupp,
        _region_suppliers,
        _t,
    )

    s_asia = _region_suppliers(spark, SCALE_DIR, "ASIA").select("s_suppkey")
    if variant == "shipped":
        from data_wrangling_spark.plans.registry import QUERIES, _load_all

        _load_all()
        return QUERIES["ext_tpch_q11_important_parts"].spark(spark, SCALE_DIR)
    if variant == "li_scan":
        return _t(spark, SCALE_DIR, "lineitem").select(
            "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
        )
    if variant == "val_full":
        return _derived_partsupp(spark, SCALE_DIR)
    if variant in ("pushdown", "val_asia"):
        unit_cents = F.round(
            F.col("l_extendedprice") / F.col("l_quantity") * 100, 0
        ).cast("bigint")
        li = (
            _t(spark, SCALE_DIR, "lineitem")
            .join(
                F.broadcast(s_asia),
                F.col("l_suppkey") == F.col("s_suppkey"),
                "left_semi",
            )
            .select(
                F.col("l_partkey").alias("ps_partkey"),
                F.col("l_suppkey").alias("ps_suppkey"),
                unit_cents.alias("_unit_cents"),
                F.round(F.col("l_quantity"), 0).cast("bigint").alias("_qty"),
            )
        )
        # shipped groups by (partkey, suppkey) first (the catalog — the
        # MIN unit cost is per PAIR), then re-aggregates per part: the
        # two-level aggregate shape must be kept to stay value-identical
        ps = li.groupBy("ps_partkey", "ps_suppkey").agg(
            F.min("_unit_cents").cast("bigint").alias("ps_cost_cents"),
            F.sum("_qty").cast("bigint").alias("ps_qty"),
        )
        val = ps.groupBy(
            F.col("ps_partkey").alias("p_partkey")
        ).agg(
            F.sum(F.col("ps_cost_cents") * F.col("ps_qty"))
            .cast("bigint")
            .alias("value_cents")
        )
        if variant == "val_asia":
            return val
        return _q11_tail(val)
    raise SystemExit(f"unknown variant {variant}")


FULL = {"shipped", "pushdown"}


def main() -> None:
    variant = sys.argv[1]
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name=f"q11-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    if variant in FULL and variant != "shipped":
        want = [tuple(r) for r in build(spark, "shipped").collect()]
        got = [tuple(r) for r in build(spark, variant).collect()]
        assert got == want, f"{variant} diverges from shipped result"

    times = []
    for _ in range(REPS + 1):
        spark.catalog.clearCache()
        df = build(spark, variant)
        t0 = time.perf_counter()
        sc.setJobDescription(f"q11-ab {variant}")
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
