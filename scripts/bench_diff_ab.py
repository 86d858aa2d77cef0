#!/usr/bin/env python3
"""Stage probes: x_corpus_snapshot_diff_realistic at 100x (round 12).

After the layout-v2 fix, DuckDB's re-derivation of the realistic diff
dropped to 1.4s while Spark's published row sits at ~5.0s = 3.5x (r11
read 1.3x against a 6.6s DuckDB — the ratio regressed purely through
the denominator). The operator is two narrow (id, xxhash64) scans, one
full-outer join on 500k ids, and fingerprints over the ~8% churn set —
nothing in that inventory should cost 5s. These probes split it.

Variants (fresh JVM each):

    hash_scan   — both narrow (id, raw-hash) projections, noop
    fo_join     — the full-outer join + fast-status classification
    churn_ids   — ... + the raw-mismatch id set (the churn set)
    slow_path   — churn ids joined back to both text sides + the
                  fingerprint compare (the regex work, churn-sized)
    full        — the registered query (fast ∪ slow, ordered)
    full_noord  — the registered query WITHOUT the final orderBy
                  (is the tail the rangepartition+sort?)

Usage:
    for v in hash_scan fo_join churn_ids slow_path full full_noord; do
        python scripts/bench_diff_ab.py $v; done

MEASURED (2026-08-16, 100x, fresh JVM, median of 3): see bottom note.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/dws-scale/mult100")


def _snapshots(spark, sf_dir):
    from data_wrangling_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    oldv = docs.filter(F.col("doc_id") % 29 != 0).select("doc_id", "text")
    newv = docs.filter(F.col("doc_id") % 31 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" rev2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return oldv, newv


def build(spark, sf_dir: str, variant: str):
    from data_wrangling_spark.operators.diff import _raw_hash, snapshot_diff

    oldv, newv = _snapshots(spark, sf_dir)
    o = oldv.select(
        F.col("doc_id").alias("_id"), _raw_hash("text").alias("_oraw")
    ).withColumn("_in_old", F.lit(True))
    n = newv.select(
        F.col("doc_id").alias("_id"), _raw_hash("text").alias("_nraw")
    ).withColumn("_in_new", F.lit(True))
    if variant == "hash_scan":
        return o.select("_id", "_oraw").unionAll(n.select("_id", "_nraw"))
    j = o.join(n, "_id", "full_outer")
    fast_status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_oraw").eqNullSafe(F.col("_nraw")), F.lit("unchanged"))
    )
    if variant == "fo_join":
        return j.select(F.col("_id"), fast_status.alias("status")).filter(
            F.col("status").isNotNull()
        )
    mis = j.filter(
        F.col("_in_old").isNotNull()
        & F.col("_in_new").isNotNull()
        & ~F.col("_oraw").eqNullSafe(F.col("_nraw"))
    ).select("_id")
    if variant == "churn_ids":
        return mis
    if variant == "slow_path":
        from data_wrangling_spark.functions.text import fingerprint

        otext = oldv.select(F.col("doc_id").alias("_id"),
                            F.col("text").alias("_ot"))
        ntext = newv.select(F.col("doc_id").alias("_id"),
                            F.col("text").alias("_nt"))
        return (
            mis.join(otext, "_id").join(ntext, "_id")
            .select(
                "_id",
                F.when(fingerprint("_ot").eqNullSafe(fingerprint("_nt")),
                       F.lit("unchanged"))
                .otherwise(F.lit("changed")).alias("status"),
            )
        )
    if variant == "full":
        return snapshot_diff(oldv, newv, "doc_id", "text").orderBy("doc_id")
    if variant == "full_noord":
        return snapshot_diff(oldv, newv, "doc_id", "text")
    if variant == "persist":
        # round-14 candidate (verdict item 3): the fast branch and the
        # churn-id branch are BOTH consumers of the same full-outer
        # join, and Spark re-executes the subtree per consumer — two
        # corpus hash-scans + two full-outer shuffles for one logical
        # join. Persist the narrow (id, hashes, flags) join output
        # (~24B/row — far below corpus scale) so it executes once;
        # per-run cost priced by the clearCache+rebuild protocol.
        from data_wrangling_spark.functions.text import fingerprint

        j = o.join(n, "_id", "full_outer").persist()
        fast = j.select(F.col("_id"), fast_status.alias("status")).filter(
            F.col("status").isNotNull()
        )
        mis2 = j.filter(
            F.col("_in_old").isNotNull()
            & F.col("_in_new").isNotNull()
            & ~F.col("_oraw").eqNullSafe(F.col("_nraw"))
        ).select("_id")
        otext = oldv.select(F.col("doc_id").alias("_id"),
                            F.col("text").alias("_ot"))
        ntext = newv.select(F.col("doc_id").alias("_id"),
                            F.col("text").alias("_nt"))
        slow = (
            mis2.join(otext, "_id").join(ntext, "_id")
            .select(
                "_id",
                F.when(fingerprint("_ot").eqNullSafe(fingerprint("_nt")),
                       F.lit("unchanged"))
                .otherwise(F.lit("changed")).alias("status"),
            )
        )
        return fast.unionAll(slow).select(
            F.col("_id").alias("doc_id"), F.col("status")
        )
    raise SystemExit(f"unknown variant {variant!r}")


def main() -> None:
    variant = sys.argv[1]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name=f"diff-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    df = build(spark, SF_DIR, variant)

    def _run(d):
        d.write.format("noop").mode("overwrite").save()

    _run(df)
    spark.catalog.clearCache()
    runs = []
    for _ in range(3):
        # time_suite protocol: rebuild the plan per timed run (outside
        # the timed window) + clearCache after, so a plan-internal
        # persist is priced as a one-shot (cache write + read) per run
        d = build(spark, SF_DIR, variant)
        t0 = time.perf_counter()
        _run(d)
        runs.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(f"{variant}: median {statistics.median(runs):.3f}s "
          f"runs {[round(r, 3) for r in runs]}")
    spark.stop()


if __name__ == "__main__":
    main()
