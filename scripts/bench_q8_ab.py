#!/usr/bin/env python3
"""Stage probe: ext_tpch_q8_market_share at 100x (round-12 verdict
item 6 — 3.3s = 6.5x DuckDB, the largest row of the "sub-4s TPC-H
band" the round-12 close note waved at collectively).

Shape at 100x: lineitem 60M rows; part/supplier/nation/region are
constant dims (copied as-is by the scale materializer) so the p_type
and supplier-nation joins broadcast; customer and orders scale, so
after the date + AMERICA-region filters orders is ~0.9M rows of
(o_orderkey, o_year) — the li x orders join is the only fact-fact
exchange in the plan.

Variants (fresh JVM each):
    li_scan   — lineitem scan + 4-col project (int-cents expr), noop
    ord_side  — orders scan + date filter + region-customer semi side
    li_dims   — li x broadcast(part) x broadcast(supp_nation), no orders
    smj       — li_dims x filtered-orders SMJ + final agg (== full)
    full      — registered query
    bc_orders — full with the filtered ~0.9M-row orders side
                broadcast-hinted into the li join (q7 lesson predicts
                a LOSS for multi-million-row hints; this one is ~16 MB
                of (long, int) — just past the auto threshold, the one
                family where hints can pay)

Usage: for v in li_scan ord_side li_dims smj full bc_orders; do
           python scripts/bench_q8_ab.py $v; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SCALE_DIR = os.environ.get("Q8_AB_DIR", "/tmp/dws-scale/mult100")
REPS = 5


def build(spark, variant):
    from data_wrangling_spark.plans.registry import QUERIES, _load_all
    from data_wrangling_spark.plans.scale_queries import _revenue_cents
    from data_wrangling_spark.sources.tables import load_table

    _load_all()
    if variant == "full":
        return QUERIES["ext_tpch_q8_market_share"].spark(spark, SCALE_DIR)

    _t = load_table
    nation = _t(spark, SCALE_DIR, "nation")
    region = _t(spark, SCALE_DIR, "region").filter(F.col("r_name") == "AMERICA")
    cust_in_region = (
        _t(spark, SCALE_DIR, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    part = (
        _t(spark, SCALE_DIR, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    orders = (
        _t(spark, SCALE_DIR, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").cast("int").alias("o_year"))
    )
    supp_nation = (
        _t(spark, SCALE_DIR, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = _t(spark, SCALE_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _revenue_cents().alias("_cents")
    )
    if variant == "li_scan":
        return li
    if variant == "ord_side":
        return orders
    if variant == "li_dims":
        return (
            li.join(part, li.l_partkey == part.p_partkey)
            .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
            .select("l_orderkey", "_cents", "supp_nation")
        )
    mkt = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("_cents")).otherwise(
            F.lit(0)
        )
    )
    total = F.sum("_cents")
    ord_side = F.broadcast(orders) if variant == "bc_orders" else orders
    if variant in ("smj", "bc_orders"):
        return (
            li.join(part, li.l_partkey == part.p_partkey)
            .join(ord_side, li.l_orderkey == F.col("o_orderkey"))
            .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
            .groupBy("o_year")
            .agg(
                mkt.cast("bigint").alias("mkt_cents"),
                total.cast("bigint").alias("total_cents"),
                F.floor(
                    mkt.cast("double") / total.cast("double") * 1000000.0
                )
                .cast("bigint")
                .alias("mkt_share_ppm"),
            )
            .orderBy("o_year")
        )
    raise SystemExit(f"unknown variant {variant}")


def main() -> None:
    variant = sys.argv[1]
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name=f"q8-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")

    if variant == "bc_orders":
        want = sorted(tuple(r) for r in build(spark, "full").collect())
        got = sorted(tuple(r) for r in build(spark, variant).collect())
        assert got == want, "bc_orders diverges from registered result"

    times = []
    for _ in range(REPS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build(spark, variant).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    ts = sorted(times)
    print("Q8_AB_JSON:" + json.dumps(
        {"variant": variant, "median": ts[len(ts) // 2], "runs": times}
    ), flush=True)


if __name__ == "__main__":
    main()
