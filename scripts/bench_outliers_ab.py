#!/usr/bin/env python3
"""A/B for x_vec_outliers' residual 2.2x gap (round-9 verdict item 6):
the shipped embedding_outliers consumes its exploded (label, id, dim,
v) projection TWICE — once for the (label, dim) centroid aggregate,
once for the distance join — so the parquet scan + posexplode run
twice. Does sharing ONE materialization of the exploded projection
(persist MEMORY_AND_DISK) beat the two scans, or is the explode cheap
enough that the cache write + read costs more than the second scan?

Variants, each timed with the bench methodology (warmup + median of 3
noop sinks; the persist variant re-persists per reap so the cache
write is INSIDE the timing, as it would be in a real run):

  shipped   — operators/similarity.embedding_outliers as registered
              (two scan+explode passes, centroid broadcast join)
  cached    — identical plan over a persisted exploded projection
              (one scan+explode, one cache write, two cache reads)

Usage:
    python scripts/bench_outliers_ab.py /tmp/dws-scale/mult100 [dirs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from data_wrangling_spark.session import get_spark  # noqa: E402

REPS = 3


def _explode(df):
    return (
        df.filter(F.col("embedding").isNotNull())
        .select(
            F.col("label").alias("_lbl"),
            F.col("vec_id").alias("_id"),
            F.posexplode("embedding").alias("_d", "_x"),
        )
        .select(
            "_lbl", "_id", "_d",
            F.round(F.col("_x").cast("double") * 10**6)
            .cast("long").alias("_v"),
        )
    )


def _finish(ex):
    cents = (
        ex.groupBy("_lbl", "_d")
        .agg(F.sum("_v").alias("_s"), F.count(F.lit(1)).alias("_n"))
        .select(
            "_lbl", "_d",
            F.floor(F.col("_s").cast("double") / F.col("_n"))
            .cast("long").alias("_c"),
        )
    )
    diff = F.col("_v") - F.col("_c")
    dist = (
        ex.join(F.broadcast(cents), ["_lbl", "_d"])
        .groupBy("_lbl", "_id")
        .agg(F.sum(diff * diff).alias("dist2"))
    )
    w = Window.partitionBy("_lbl").orderBy(F.col("dist2").desc(), F.col("_id"))
    return (
        dist.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(F.col("_lbl").alias("label"), F.col("_id").alias("vec_id"),
                F.col("dist2").cast("long").alias("dist2"),
                F.col("rnk").cast("int").alias("rnk"))
        .orderBy("label", "rnk")
    )


def time_shipped(spark, emb) -> float:
    from data_wrangling_spark.operators.similarity import embedding_outliers

    def run():
        embedding_outliers(emb).write.format("noop").mode("overwrite").save()

    run()  # warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 2)


def time_cached(spark, emb) -> float:
    def run():
        ex = _explode(emb).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            _finish(ex).write.format("noop").mode("overwrite").save()
        finally:
            ex.unpersist(blocking=True)

    run()  # warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 2)


def main() -> None:
    dirs = sys.argv[1:] or ["/tmp/dws-scale/mult100"]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(app_name="outliers-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        # parity check once per dir: identical output either way
        from data_wrangling_spark.operators.similarity import (
            embedding_outliers,
        )
        a = embedding_outliers(emb)
        ex = _explode(emb).persist(StorageLevel.MEMORY_AND_DISK)
        b = _finish(ex)
        mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()
        ex.unpersist(blocking=True)
        print({
            "dir": d,
            "rows": emb.count(),
            "parity_mismatch": mismatch,
            "shipped_s": time_shipped(spark, emb),
            "cached_s": time_cached(spark, emb),
        }, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
