#!/usr/bin/env python3
"""A/B: broadcast-hint variants of ext_tpch_q7_volume_shipping at 100x.

Round-10 verdict item 2 proposed broadcast-hinting the narrow
(c_custkey, cust_region) projection (~20 MB at 100x) to delete the
orders-side shuffle. Measured (fresh JVM per variant — a shared JVM
swings these numbers by 3x, the same co-tenancy that corrupted the
round-10 table; median-of-3 after warmup, 100x dir):

    none (r10 shipped) : 4.94s
    cust hint only     : 14.46s   <- REJECTED: 3x worse
    both hints         : 6.55s
    supp hint only     : 4.35s    <- shipped round 11

Why cust-broadcast loses despite removing a shuffle: the 1.5M-entry
broadcast hash relation is rebuilt per execution (driver-side
serialize + build) and then probed RANDOMLY by 32 threads across a
>100 MB table (L3 thrash); the SMJ it replaces streams sorted runs,
and shuffling the narrow (o_orderkey, o_custkey) orders projection is
cheaper than that build+probe. The supp hint wins because — round-12
correction: supplier is a fixed 1000-row dim (~13 KB projected) at
every bench multiplier, NOT 1M rows — Catalyst's post-join size
ESTIMATE for supplier⨝nation⨝region compounds multiplicatively above
the 10 MB threshold, so unhinted the li-side lookup silently plans a
third SMJ at 100x (verified by plan read). The shipped query size-gates
the hint on supplier's actual on-disk bytes so extreme-SF deployments
keep the adaptive fallback.

Stage probes (fresh JVM): li scan+filter+project (17.6M rows) 0.91s;
orders SMJ customer -> 15M-row oc 1.82s; remaining (li shuffle +
merge join + broadcast-supp probe + agg) ~1.6s. DuckDB does the whole
query in 1.28s with shared-memory hash joins — the gap is the
materialized two-fact shuffle, the distributed-engine tax that buys
horizontal scale-out. advisoryPartitionSizeInBytes=8m was also tried:
5.24s, worse — the 16m session default stands.

Usage (each variant MUST be its own process):
    for v in none cust both supp; do python scripts/bench_q7_ab.py $v; done
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build(spark, sf_dir: str, hint_cust: bool, hint_supp: bool,
          shj_oc: bool = False, shj_cust: bool = False):
    from data_wrangling_spark.sources.tables import load_table

    def _t(name):
        return load_table(spark, sf_dir, name)

    nation, region = _t("nation"), _t("region")
    nr = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "r_name")
    supp = _t("supplier").join(
        F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("r_name").alias("supp_region"))
    cust = _t("customer").join(
        F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("r_name").alias("cust_region"))
    orders = _t("orders").select("o_orderkey", "o_custkey")
    li = _t("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long").alias("_cents"),
    )
    c = F.broadcast(cust) if hint_cust else cust
    if shj_cust:
        # round-14: shuffled-hash instead of sort-merge for orders⨝cust
        # (guide §3.1 — build the narrow cust projection per partition,
        # skip both sorts)
        c = c.hint("shuffle_hash")
    s = F.broadcast(supp) if hint_supp else supp
    oc = orders.join(c, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "cust_region"
    )
    if shj_oc:
        # round-14: shuffled-hash for the li⨝oc fact-fact join, build =
        # the (o_orderkey, cust_region) side — removes the two big sorts
        oc = oc.hint("shuffle_hash")
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .join(s, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("supp_region") != F.col("cust_region"))
        .groupBy("supp_region", "cust_region",
                 F.year("l_shipdate").cast("int").alias("l_year"))
        .agg((F.sum("_cents") / F.lit(100.0)).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("supp_region", "cust_region", "l_year")
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from data_wrangling_spark.session import get_spark

    variant = sys.argv[1] if len(sys.argv) > 1 else "supp"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dws-scale/mult100"
    spark = get_spark(app_name=f"dws-q7-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    df = build(spark, sf_dir,
               hint_cust=variant in ("cust", "both"),
               hint_supp=variant in ("supp", "both", "shj", "shj_oc",
                                     "shj_cust"),
               shj_oc=variant in ("shj", "shj_oc"),
               shj_cust=variant in ("shj", "shj_cust"))

    def run(d):
        d.write.format("noop").mode("overwrite").save()

    run(df)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(df)
        runs.append(time.perf_counter() - t0)
    print(f"RESULT {variant}: median {statistics.median(runs):.3f}s "
          f"runs={[round(r, 2) for r in runs]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
