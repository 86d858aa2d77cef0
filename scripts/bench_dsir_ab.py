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

MEASURED (100x, fresh JVM, value-hash parity OK): shipped recompute
23.9s vs persisted 16.1s — it DOES flip: the cache write+read beats
re-running explode + md5 + conv over 50M tokens. Shipped as
``dsir_importance(persist_tokens=True)`` (default False — the cache
outlives the returned DataFrame's execution and a repeated-measurement
harness would otherwise time warm re-runs; see the operator
docstring). Each timed run here builds a FRESH DataFrame and clears
the cache afterward, so the persisted median is the honest ONE-SHOT
cost including cache population.

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
    """The operator's own persist_tokens=True path (round-11 flag —
    this A/B is the measurement that justified adding it). Returns the
    DataFrame; callers clear the internal cache between runs via
    spark.catalog.clearCache()."""
    from data_wrangling_spark.operators.text_analysis import dsir_importance
    from data_wrangling_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return dsir_importance(docs, F.col("lang") == "en", persist_tokens=True)


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
        b_df = persisted(spark, d)
        # DECIMAL(38,0) fold — a raw long sum overflows under ANSI mode
        ha = a_df.select(F.sum(F.xxhash64(*a_df.columns)
                               .cast("decimal(38,0)"))).collect()[0][0]
        hb = b_df.select(F.sum(F.xxhash64(*b_df.columns)
                               .cast("decimal(38,0)"))).collect()[0][0]
        spark.catalog.clearCache()
        print(f"{d}: value-hash parity {'OK' if ha == hb else 'MISMATCH'}"
              f" ({ha} vs {hb})", flush=True)
        for label, build in (("shipped (recompute)", lambda: shipped(spark, d)),
                             ("persisted toks", None)):
            runs = []
            for _ in range(3):
                # fresh DataFrame + cleared cache per run: each timed
                # run pays its own cache population (one-shot cost)
                df = persisted(spark, d) if label.startswith("persisted") \
                    else build()
                t0 = time.perf_counter()
                _noop(df)
                runs.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            print(f"{d} {label}: median {statistics.median(runs):.3f}s "
                  f"runs={[round(r, 3) for r in runs]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
