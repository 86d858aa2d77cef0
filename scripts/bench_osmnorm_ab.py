#!/usr/bin/env python3
"""A/B + stage probes: x_osm_scale_normalize at 100x.

Round-13: the 13.4s 100x row is the largest absolute in the whole
SCALING extras table with no stage split. The query = split-parallel
XML parse (8 MB boundary-synced splits) -> persist raw -> derive the 5
normalized tables (clean=True, validate='permissive') -> count each ->
union of 5 one-row aggregates. Where does the wall go: the Python
parse, building the cache, or the five cache-scan count jobs (whose
validation filter references the CLEANED value column, so tag cleaning
is semantically load-bearing for the counts)?

Variants (fresh JVM per variant; cache cleared between reps so the
persist is priced per run, same as the bench harness):

    shipped     — the registered query form.
    parse       — parse-only noop write (the scan floor; the round-12
                  anchor measured 5.3s for this on the same file).
    parse_count — parse -> ONE count, no persist (floor + cheapest
                  possible consumer).
    persist_one — parse -> persist -> ONE count (adds the cache build).
    nocache     — shipped with cache_raw=False (5 independent parses;
                  confirms the persist is still the right call).
    noclean     — shipped with clean=False (NOT value-identical — the
                  probe isolates what raw-value cleaning costs inside
                  the five counts; result discarded).
    warm_counts — build + materialize the cache once OUTSIDE the timed
                  region, then time the 5-count union over the warm
                  cache (isolates the count jobs from parse+persist).

Usage (fresh JVM per variant):
    for v in shipped parse parse_count persist_one nocache noclean \
             warm_counts; do python scripts/bench_osmnorm_ab.py $v; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # match the extras workers

from pyspark.sql import functions as F  # noqa: E402

SCALE_DIR = os.environ.get("OSMNORM_AB_DIR", "/tmp/dws-scale/mult100")
REPS = 3


def _raw(spark):
    from data_wrangling_spark.sources.osm_xml import read_osm_xml

    return read_osm_xml(
        spark, os.path.join(SCALE_DIR, "osm_scaled.osm"), split_bytes=8 << 20
    )


def _counts(tables) -> "F.DataFrame":
    counts = None
    for name in sorted(tables):
        part = tables[name].agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("table"), "n_rows"
        )
        counts = part if counts is None else counts.unionAll(part)
    return counts.orderBy("table")


def build(spark, variant):
    from data_wrangling_spark.operators.normalize import normalize

    if variant == "parse":
        return _raw(spark)
    if variant == "parse_count":
        return _raw(spark).agg(F.count(F.lit(1)).alias("n"))
    if variant == "persist_one":
        return _raw(spark).persist().agg(F.count(F.lit(1)).alias("n"))
    if variant in ("shipped", "warm_counts"):
        out = normalize(
            _raw(spark), clean=True, validate="permissive", cache_raw=True
        )
        return _counts(out.as_dict())
    if variant == "fused":
        # round-13 registered form: normalize_counts aggregate pushdown
        from data_wrangling_spark.operators.normalize import normalize_counts

        return normalize_counts(
            _raw(spark), clean=True, validate="permissive"
        )
    if variant == "nocache":
        out = normalize(
            _raw(spark), clean=True, validate="permissive", cache_raw=False
        )
        return _counts(out.as_dict())
    if variant == "noclean":
        out = normalize(
            _raw(spark), clean=False, validate="permissive", cache_raw=True
        )
        return _counts(out.as_dict())
    raise SystemExit(f"unknown variant {variant}")


def main() -> None:
    variant = sys.argv[1]
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name=f"osmnorm-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    times = []
    df = build(spark, variant)
    if variant == "warm_counts":
        # materialize the cache outside the timed region once; reps
        # then time only the five count jobs over the warm cache
        df.write.format("noop").mode("overwrite").save()
        for _ in range(REPS + 1):
            t0 = time.perf_counter()
            sc.setJobDescription(f"osmnorm-ab {variant}")
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
    else:
        for i in range(REPS + 1):
            spark.catalog.clearCache()
            df = build(spark, variant)
            t0 = time.perf_counter()
            sc.setJobDescription(f"osmnorm-ab {variant}")
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
