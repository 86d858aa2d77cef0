#!/usr/bin/env python3
"""A/B + stage probes: ext_tpch_q13_order_distribution at 100x.

Round-13: the 100x row reads 2.55s = 8.3x DuckDB, waved at collectively
in round 12 as part of the "sub-4s TPC-H band" without its own probe.
The plan already pre-aggregates orders per custkey before the outer
join (the shuffle carries |customers| not |orders|), so the remaining
candidates are (a) the orders-side aggregate itself (15M rows in), and
(b) the customer-side exchange feeding the sort-merge LEFT join. (b)
can be removed: flip the join to `per_cust_orders RIGHT OUTER customer`
with the aggregated side broadcast — customer is then streamed straight
from the scan into the histogram's partial aggregate, zero exchanges on
the 1.5M-row side (guide §3.1; broadcast of ~1.5M (long, long) rows is
~24 MB framed, above the 10 MB auto threshold, so it needs the explicit
hint).

Variants:
    shipped     — registered form (SMJ/SHJ left join).
    bcast_right — right-outer join with broadcast(per_cust_orders).
    orders_agg  — stage: the per-custkey orders aggregate alone.
    cust_scan   — stage: customer c_custkey scan alone.

Full variants assert value-identity vs shipped before timing.

Usage:
    for v in shipped bcast_right orders_agg cust_scan; do \
        python scripts/bench_q13_ab.py $v; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # match the extras workers

from pyspark.sql import functions as F  # noqa: E402

SCALE_DIR = os.environ.get("Q13_AB_DIR", "/tmp/dws-scale/mult100")
REPS = 5


def build(spark, variant):
    from data_wrangling_spark.plans.scale_queries import _t

    cust = _t(spark, SCALE_DIR, "customer").select("c_custkey")
    per_cust_orders = (
        _t(spark, SCALE_DIR, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    if variant == "orders_agg":
        return per_cust_orders
    if variant == "cust_scan":
        return cust
    if variant == "shipped":
        per_cust = cust.join(
            per_cust_orders, cust.c_custkey == F.col("o_custkey"), "left"
        ).select(
            F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("c_count")
        )
    elif variant == "bcast_right":
        per_cust = (
            F.broadcast(per_cust_orders)
            .join(cust, cust.c_custkey == F.col("o_custkey"), "right")
            .select(
                F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("c_count")
            )
        )
    else:
        raise SystemExit(f"unknown variant {variant}")
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


FULL = {"shipped", "bcast_right"}


def main() -> None:
    variant = sys.argv[1]
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name=f"q13-ab-{variant}")
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
        sc.setJobDescription(f"q13-ab {variant}")
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
