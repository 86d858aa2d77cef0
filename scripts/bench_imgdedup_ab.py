#!/usr/bin/env python3
"""Stage probe: x_multimodal_image_dedup at 100x (round-12 verdict
item 8, optional) — at 20.5s it is the largest absolute row in the
SCALING extras table (0.4x DuckDB, a Spark WIN, so not weak); this
probe answers whether the 20s is decode-bound (irreducible — the
aHash decode of every raster IS the workload) or join-bound (tunable
banded-LSH shape).

Stages (fresh JVM per variant):
    synth      — synth_pgm_from_documents alone (payload construction,
                 no decode): the input-side floor.
    hash       — synth + image_ahash (the Arrow-UDF PGM decode + 8x8
                 block means + global-mean threshold): the decode
                 stage.
    bands      — hash + the 4-way band explode, no join (adds the
                 projection cost of the candidate keys).
    full       — registered query: bands self-join on (band, value) +
                 exact Hamming <= 8 + DISTINCT pair set.

decode cost = hash - synth; join cost = full - bands. Whichever
dominates names the floor in the registered query's docstring.

Usage: for v in synth hash bands full; do
           python scripts/bench_imgdedup_ab.py $v; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SCALE_DIR = os.environ.get("IMGDEDUP_AB_DIR", "/tmp/dws-scale/mult100")
REPS = 5

# match the SCALING extras-worker environment: the default driver heap
# OOMs in the band-join spill path at 100x (first probe run died in
# UnsafeSorterSpillReader allocation)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")


def build(spark, variant):
    from data_wrangling_spark.operators.multimodal import (
        ahash_near_dup,
        image_ahash,
        synth_pgm_from_documents,
    )
    from data_wrangling_spark.sources.tables import load_table

    docs = load_table(spark, SCALE_DIR, "documents")
    media = synth_pgm_from_documents(docs.filter(F.length("text") >= 64))
    if variant == "synth":
        return media
    hashes = image_ahash(media)
    if variant == "hash":
        return hashes
    if variant == "bands":
        bands = hashes.select(
            "media_id",
            "ahash_hi",
            "ahash_lo",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("bi"),
        )
        return bands.withColumn(
            "bv",
            F.when(F.col("bi") == 0, F.col("ahash_lo") % 65536)
            .when(F.col("bi") == 1, (F.col("ahash_lo") / 65536).cast("long") % 65536)
            .when(F.col("bi") == 2, F.col("ahash_hi") % 65536)
            .otherwise((F.col("ahash_hi") / 65536).cast("long") % 65536),
        )
    if variant == "full":
        return ahash_near_dup(hashes, max_hamming=8)
    raise SystemExit(f"unknown variant {variant}")


def main() -> None:
    variant = sys.argv[1]
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name=f"imgdedup-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")

    times = []
    for _ in range(REPS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build(spark, variant).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    ts = sorted(times)
    print("IMGDEDUP_AB_JSON:" + json.dumps(
        {"variant": variant, "median": ts[len(ts) // 2], "runs": times}
    ), flush=True)


if __name__ == "__main__":
    main()
