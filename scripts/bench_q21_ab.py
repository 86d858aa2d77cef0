#!/usr/bin/env python3
"""A/B + stage probes: ext_tpch_q21_waiting_suppliers at 100x.

Round-11 verdict item 1: the published solo row is 6.0s = 4.2x DuckDB
while the docstring claimed a ~2.7x two-fact-shuffle floor, with a
bimodal {3.9-4.0} / {5.9-6.5} JVM-to-JVM band on an identical AQE
plan. This script gives q21 the q7 treatment: per-stage timers that
split the wall into its physical pieces, plus a rework A/B.

Variants (each MUST run in its own fresh JVM — a shared JVM swings
4-8s absolutes by 1.6x, see perf-lessons):

    window  — shipped round-11 form: SMJ li(ok,sk,ship) x F-orders,
              four MIN/MAX identities in ONE WindowExec over
              partitionBy(l_orderkey), filter, broadcast-asia, agg.
    agg     — round-12 rework: same SMJ, then ONE
              groupBy(l_orderkey) SortAggregate riding the join's
              partitioning+sort. Key insight: a qualifying order's
              late lines ALL share one supplier (min_ls == max_ls),
              so the order collapses to (late_supplier = min_ls,
              n_late) inside the aggregate — no window buffers, no
              60M-row pass-through emission, no join-back; the
              broadcast-asia join and final agg run on the ~per-order
              survivor set instead of the full joined fact.

Stage probes (window variant decomposition):

    li_scan     — lineitem scan + 3-col project, noop sink
    ord_scan    — orders scan + status-F filter + 2-col project
    smj         — the li x F-orders SMJ alone (joined projection)
    smj_window  — SMJ + the four-window WindowExec + filter
    smj_agg     — SMJ + the groupBy(l_orderkey) aggregate + filter

MEASURED (2026-08-16, 100x, fresh JVM per variant, median of 3 after
warmup; the in-JVM run band is quoted because it is the finding):

    li_scan     0.43s   [0.36-0.74]
    ord_scan    0.25s   [0.24-0.70]
    smj         5.50s   [4.58-13.86]   <- the wall, alone
    smj_window  7.08s   [3.72-7.69]
    smj_agg    11.38s   [6.10-13.30]
    window      5.02s / 4.68s medians, pooled runs [3.72-9.31]
    agg         8.19s / 4.55s medians, pooled runs [3.72-8.80]

Verdict: the SMJ ALONE costs as much as the full query — window,
filter, broadcast-asia and final agg ride the join's partitioning and
sort inside run-to-run noise; the agg rework (no window buffers, no
join-back) is value-identical (checked vs oracle at sf0.01) but a
measured WASH, so the shipped window form stays. The 4.2x-vs-DuckDB
residual is the materialized two-fact shuffle (DuckDB: shared-memory
hash join, 1.4s), the same floor q7's probes documented, and the r11
bimodal {3.9-4.0}/{5.9-6.5} band is shuffle/JVM-resident (it shows up
in the smj probe itself), not a window-buffer effect — publish median
+ band for this row.

Usage (fresh JVM per variant):
    for v in li_scan ord_scan smj smj_window smj_agg window agg; do
        python scripts/bench_q21_ab.py $v; done
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/dws-scale/mult100")


def _parts(spark, sf_dir):
    from data_wrangling_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    return li, orders


def _joined(li, orders, shj: bool = False):
    if shj:
        orders = orders.hint("shuffle_hash")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "_late",
            F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "_late")
    )


def _windowed(lo):
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_orderkey")
    late_s = F.when(F.col("_late"), F.col("l_suppkey"))
    return (
        lo.withColumn("_min_s", F.min("l_suppkey").over(w))
        .withColumn("_max_s", F.max("l_suppkey").over(w))
        .withColumn("_min_ls", F.min(late_s).over(w))
        .withColumn("_max_ls", F.max(late_s).over(w))
        .filter(
            F.col("_late")
            & (F.col("_min_s") != F.col("_max_s"))
            & (F.col("_min_ls") == F.col("_max_ls"))
        )
    )


def _aggregated(lo):
    late_s = F.when(F.col("_late"), F.col("l_suppkey"))
    return (
        lo.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("_min_s"),
            F.max("l_suppkey").alias("_max_s"),
            F.min(late_s).alias("_min_ls"),
            F.max(late_s).alias("_max_ls"),
            F.sum(F.when(F.col("_late"), F.lit(1)).otherwise(F.lit(0)))
            .alias("n_late"),
        )
        .filter(
            (F.col("_min_s") != F.col("_max_s"))
            & F.col("_min_ls").isNotNull()
            & (F.col("_min_ls") == F.col("_max_ls"))
        )
    )


def build(spark, sf_dir: str, variant: str):
    from data_wrangling_spark.plans.scale_queries import _region_suppliers

    li, orders = _parts(spark, sf_dir)
    if variant == "li_scan":
        return li
    if variant == "ord_scan":
        return orders
    lo = _joined(li, orders, shj=variant.endswith("_shj") or variant == "shj")
    if variant in ("smj", "shj"):
        return lo
    if variant == "smj_window":
        return _windowed(lo)
    if variant in ("smj_agg", "agg2_shj"):
        return _aggregated(lo)
    asia = _region_suppliers(spark, sf_dir, "ASIA").select("s_suppkey", "s_name")
    if variant == "agg_shj":
        # round-14 candidate: SHUFFLE_HASH hint on the F-orders side of
        # the fact-fact join (guide §3.1: no sort of either side; build
        # = per-partition slice of the 2-column F-orders projection)
        # + the r12 conditional aggregate, which after an UNSORTED SHJ
        # plans as a HashAggregate riding the join's partitioning —
        # the two 60M/7.5M-row sorts of the SMJ plan disappear.
        waiting = _aggregated(lo).join(
            F.broadcast(asia), F.col("_min_ls") == F.col("s_suppkey")
        )
        return (
            waiting.groupBy("s_name")
            .agg(F.sum("n_late").cast("long").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(20)
        )
    if variant == "window":
        waiting = _windowed(lo).join(
            F.broadcast(asia), F.col("l_suppkey") == F.col("s_suppkey")
        )
        return (
            waiting.groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(20)
        )
    if variant == "agg":
        waiting = _aggregated(lo).join(
            F.broadcast(asia), F.col("_min_ls") == F.col("s_suppkey")
        )
        return (
            waiting.groupBy("s_name")
            .agg(F.sum("n_late").cast("long").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(20)
        )
    raise SystemExit(f"unknown variant {variant!r}")


def main() -> None:
    variant = sys.argv[1]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name=f"q21-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    df = build(spark, SF_DIR, variant)

    def _run():
        df.write.format("noop").mode("overwrite").save()

    _run()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _run()
        runs.append(time.perf_counter() - t0)
    print(f"{variant}: median {statistics.median(runs):.3f}s "
          f"runs {[round(r, 3) for r in runs]}")
    spark.stop()


if __name__ == "__main__":
    main()
