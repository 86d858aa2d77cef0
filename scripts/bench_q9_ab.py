#!/usr/bin/env python3
"""A/B: join-strategy variants of ext_tpch_q9_product_type_profit at 100x.

Round-14 (verdict item 5). The shipped plan's only big-big join is
lineitem(%gear%-filtered via broadcast part, ~13% of the fact) ⨝ orders
on orderkey — a sort-merge join that sorts BOTH sides (the ~8M-row
filtered li projection and the 15M-row 2-column orders projection) just
to attach o_orderdate. Candidates (guide §3.1 — shuffled hash join skips
both sorts; build side chosen as the SMALLER per-partition slice):

    none    — shipped r12 form (SMJ)
    shj_li  — SHUFFLE_HASH hint on the filtered li side (smaller: ~8M
              rows at 100x vs 15M orders)
    shj_ord — SHUFFLE_HASH hint on the orders projection

The part/supplier/nation lookups already broadcast below the fact join
(verdict item 5's semi-pushdown ask is the shipped shape: the %gear%
filter cuts lineitem BEFORE the orderkey exchange).

Usage (fresh JVM per variant, interleave rounds):
    for v in none shj_li shj_ord; do python scripts/bench_q9_ab.py $v; done
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build(spark, sf_dir: str, variant: str):
    from data_wrangling_spark.sources.tables import load_table

    def _t(name):
        return load_table(spark, sf_dir, name)

    parts = (
        _t("part").filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    nation = _t("nation").select("n_nationkey", "n_name")
    supp = (
        _t("supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = _t("orders").select("o_orderkey", "o_orderdate")
    amount_cents = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100,
        0,
    ).cast("bigint")
    li = (
        _t("lineitem")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", amount_cents.alias("_cents"), "n_name")
    )
    if variant == "shj_li":
        li = li.hint("shuffle_hash")
    elif variant == "shj_ord":
        orders = orders.hint("shuffle_hash")
    elif variant != "none":
        raise SystemExit(f"unknown variant {variant!r}")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg((F.sum("_cents").cast("bigint") / F.lit(100.0)).alias("sum_profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from data_wrangling_spark.session import get_spark

    variant = sys.argv[1] if len(sys.argv) > 1 else "none"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dws-scale/mult100"
    spark = get_spark(app_name=f"dws-q9-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    df = build(spark, sf_dir, variant)

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
