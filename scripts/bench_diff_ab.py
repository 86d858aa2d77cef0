#!/usr/bin/env python3
"""A/B for x_corpus_snapshot_diff's 100x gap (round-8 verdict item 6):
is the 4.7x-vs-DuckDB ratio the md5 hash or the normalization REGEX?

Times, at each scale dir, the isolated stages of the diff's per-side
projection and the full diff with three internal-key variants:

  raw        — xxhash64(text), no normalization (lower bound: pure scan
               + 8-byte hash, whitespace-edit semantics LOST)
  norm_only  — the two-regex normalize alone (no hash) — isolates the
               regex constant
  md5        — fingerprint() as shipped (md5 of normalized)
  xxh        — xxhash64 of normalized (the candidate swap)

If norm_only ~ md5 ~ xxh >> raw, the regex dominates and swapping the
hash buys nothing — document the floor and keep md5 (engine-portable,
user-facing manifests reuse it). Usage:

    python scripts/bench_diff_ab.py /tmp/dws-scale/mult100 [more dirs]

Round-10 addendum (`--churn`): the round-9 verdict refuted the "regex
floor" — raw-equal implies normalized-equal, so the regex only NEEDS
to run on raw-mismatched present-in-both pairs. The shipped
operators/diff.py short-circuits on a raw xxhash64 compare and
fingerprints only the churn set. `--churn` sweeps churn rates
1% / 10% / 100% (suffix-edit on doc_id % {100,10,1} == 0) comparing
the OLD normalize-everything plan against the SHIPPED short-circuit:

    python scripts/bench_diff_ab.py --churn /tmp/dws-scale/mult100
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_wrangling_spark.session import get_spark  # noqa: E402
from data_wrangling_spark.functions.text import normalized  # noqa: E402

REPS = 3


def timeit(df) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 2)


def diff_with(old, new, key_expr) -> "object":
    o = old.select(F.col("doc_id").alias("_id"),
                   key_expr("text").alias("_ofp"),
                   F.lit(True).alias("_in_old"))
    n = new.select(F.col("doc_id").alias("_id"),
                   key_expr("text").alias("_nfp"),
                   F.lit(True).alias("_in_new"))
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_ofp").eqNullSafe(F.col("_nfp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("_id", status.alias("status"))


def churn_sweep(spark, dirs) -> None:
    """OLD normalize-everything diff vs SHIPPED raw-hash short-circuit
    at 1% / 10% / 100% churn (plus the registered query's mixed
    added/removed/changed shape)."""
    from data_wrangling_spark.operators.diff import snapshot_diff

    old_plan = lambda o, n: diff_with(  # noqa: E731
        o, n, lambda c: F.md5(normalized(c))
    )
    for d in dirs:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        for label, mod in [("1pct", 100), ("10pct", 10), ("100pct", 1)]:
            oldv = docs.select("doc_id", "text")
            newv = docs.select(
                "doc_id",
                F.when(F.col("doc_id") % mod == 0,
                       F.concat(F.col("text"), F.lit(" rev2")))
                .otherwise(F.col("text")).alias("text"),
            )
            out = {
                "dir": d,
                "churn": label,
                "old_normalize_all_s": timeit(old_plan(oldv, newv)),
                "new_short_circuit_s": timeit(snapshot_diff(oldv, newv)),
            }
            print(out, flush=True)


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--churn":
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
        spark = get_spark(app_name="diff-ab-churn")
        spark.sparkContext.setLogLevel("ERROR")
        churn_sweep(spark, args[1:] or ["/tmp/dws-scale/mult100"])
        spark.stop()
        return
    dirs = args or ["/tmp/dws-scale/mult100"]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(app_name="diff-ab")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {
        "raw": lambda c: F.xxhash64(F.col(c)),
        "norm_only": lambda c: normalized(c),
        "md5": lambda c: F.md5(normalized(c)),
        "xxh": lambda c: F.xxhash64(normalized(c)),
    }
    for d in dirs:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        oldv = docs.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
        newv = docs.filter(F.col("doc_id") % 5 != 0).select(
            "doc_id",
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.col("text"), F.lit(" rev2")))
            .otherwise(F.col("text")).alias("text"),
        )
        out = {"dir": d, "docs": docs.count()}
        for name, kexpr in variants.items():
            proj = docs.select("doc_id", kexpr("text").alias("_k"))
            out[f"scan_{name}_s"] = timeit(proj)
            out[f"diff_{name}_s"] = timeit(diff_with(oldv, newv, kexpr))
        print(out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
