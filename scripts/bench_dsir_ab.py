#!/usr/bin/env python3
"""A/B: does persisting DSIR's tokenized (id, is_target, bucket)
projection beat recomputing the token explode for pass 2?

Round-10 verdict item 6 (round-11 follow-up): x_text_dsir sits at
exactly 2.0x DuckDB dedicated at 100x. The committed analysis already
rejected the third-pass (broadcast-subquery totals) and
eager-checkpoint variants on measurement; the one untried lever is
``toks.persist()`` — pass 1 (bucket-model aggregate) populates the
cache, pass 2 (scoring join) reads it back instead of re-running
scan + tokenize + explode + md5-bucket. The vec_outliers A/B
(scripts/bench_outliers_ab.py, round 10) found caching a corpus-sized
exploded projection LOSES at local NVMe scan speeds (cache write+read
beats nothing); this measures whether DSIR's costlier per-pass compute
(md5 bucket hash ~6s/pass) flips that verdict.

Usage: python scripts/bench_dsir_ab.py /tmp/dws-scale/mult100 [more dirs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def shipped(spark, sf_dir):
    from data_wrangling_spark.operators.text_analysis import dsir_importance
    from data_wrangling_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return dsir_importance(docs, F.col("lang") == "en")


def persisted(spark, sf_dir):
    """dsir_importance with ONE change: toks is persisted
    (MEMORY_AND_DISK) so pass 2 reuses pass 1's explode."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from data_wrangling_spark.operators import text_analysis as TX_OPS
    from data_wrangling_spark.sources.tables import load_table

    TX = TX_OPS.TX
    n_buckets = 1024
    id_col, text_col = "doc_id", "text"
    df = load_table(spark, sf_dir, "documents")
    target = F.col("lang") == "en"

    bucket = (
        F.conv(F.substring(F.md5(F.col("_tok")), 1, 4), 16, 10).cast("long")
        % n_buckets
    )
    base = df.select(
        F.col(id_col), target.alias("_is_t"), F.col(text_col).alias("_text")
    )
    toks = base.filter(F.col("_text").isNotNull()).select(
        F.col(id_col), "_is_t", F.explode(TX.tokens("_text")).alias("_tok")
    ).select(F.col(id_col), "_is_t", bucket.alias("_bucket")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    counts = toks.groupBy("_bucket").agg(
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("_ct"),
        F.sum(F.when(F.col("_is_t"), 0).otherwise(1)).alias("_cs"),
    )
    wall = Window.partitionBy()
    b = F.lit(float(n_buckets))
    lr = counts.select(
        "_bucket", "_ct", "_cs",
        F.sum("_ct").over(wall).alias("_nt"),
        F.sum("_cs").over(wall).alias("_ns"),
    ).select(
        "_bucket",
        F.round(
            F.lit(1000000.0)
            * F.log(
                ((F.col("_ct") + 1).cast("double") / (F.col("_nt") + b))
                / ((F.col("_cs") + 1).cast("double") / (F.col("_ns") + b))
            )
        ).cast("long").alias("_lr_micro"),
    )
    scored = (
        toks.join(F.broadcast(lr), "_bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_lr_micro").alias("weight_micro"),
        )
    )
    avg = F.round(
        F.col("weight_micro").cast("double") / F.col("n_tokens")
    ).cast("long")
    out = (
        base.select(id_col, "_is_t")
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.col("_is_t").alias("is_target"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("weight_micro", F.lit(0)).cast("long")
            .alias("weight_micro"),
            F.when(F.col("n_tokens") > 0, avg).alias("avg_micro"),
            F.when(F.col("n_tokens") > 0, avg > 0)
            .otherwise(F.lit(False)).alias("selected"),
        )
        .orderBy(id_col)
    )
    return out, toks


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name="dws-dsir-ab")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = sys.argv[1:] or ["/tmp/dws-scale/mult100"]
    for d in dirs:
        # value parity once per dir (cheap order-free xxhash64 fold)
        a_df = shipped(spark, d)
        b_df, cache = persisted(spark, d)
        ha = a_df.select(F.sum(F.xxhash64(*a_df.columns))).collect()[0][0]
        hb = b_df.select(F.sum(F.xxhash64(*b_df.columns))).collect()[0][0]
        cache.unpersist(True)
        print(f"{d}: value-hash parity {'OK' if ha == hb else 'MISMATCH'}"
              f" ({ha} vs {hb})", flush=True)
        for label, build in (("shipped (recompute)", lambda: shipped(spark, d)),
                             ("persisted toks", None)):
            runs = []
            for _ in range(3):
                if label.startswith("persisted"):
                    df, cache = persisted(spark, d)
                else:
                    df = build()
                    cache = None
                t0 = time.perf_counter()
                _noop(df)
                runs.append(time.perf_counter() - t0)
                if cache is not None:
                    cache.unpersist(True)
            print(f"{d} {label}: median {statistics.median(runs):.3f}s "
                  f"runs={[round(r, 3) for r in runs]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
