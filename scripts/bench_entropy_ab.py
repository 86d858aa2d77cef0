#!/usr/bin/env python3
"""A/B + stage probes: x_text_entropy at 100x.

Round-13: the 100x row reads 2.76s = 4.1x DuckDB. The shipped operator
explodes STRING tokens and hash-aggregates (doc_id, token-string)
pairs — the exact shape the round-9 lm_score/boilerplate finding
identified as the repo's dominant hidden cost (string-keyed shuffles of
token occurrences). Two candidate reworks, both value-identical modulo
xxhash64 collisions (which the oracle would surface as a driver hash
mismatch — the accepted lm_score caveat):

    shipped   — explode strings -> groupBy(doc, token) -> groupBy(doc).
    hashdom   — hash INSIDE the token array (transform + xxhash64, the
                lm_score recipe), explode longs, same two aggregates —
                shuffles (doc, long) not (doc, string).
    hof       — ZERO-shuffle: sort the hashed array, compute run
                lengths with array HOFs (boundaries where h[i] != h[i-1]),
                then n / distinct / sum(round(1e6*c*ln c)) per document
                in one codegen-adjacent projection — no explode, no
                aggregate exchange at all (guide §2.4: remove shuffles
                outright).
    tokenize  — stage: tokens projection alone (scan+regex floor).

Usage:
    for v in shipped hashdom hof tokenize; do \
        python scripts/bench_entropy_ab.py $v; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # match the extras workers

from pyspark.sql import functions as F  # noqa: E402

SCALE_DIR = os.environ.get("ENTROPY_AB_DIR", "/tmp/dws-scale/mult100")
REPS = 5


def _docs(spark):
    from data_wrangling_spark.sources.tables import load_table

    return load_table(spark, SCALE_DIR, "documents")


def build(spark, variant):
    from data_wrangling_spark.functions.text import tokens
    from data_wrangling_spark.operators.text_analysis import token_entropy

    docs = _docs(spark)
    if variant == "shipped":
        return token_entropy(docs)
    if variant == "tokenize":
        return docs.filter(F.col("text").isNotNull()).select(
            "doc_id", tokens("text").alias("_toks")
        )
    if variant == "hashdom":
        counts = (
            docs.filter(F.col("text").isNotNull())
            .select(
                F.col("doc_id"),
                F.explode(
                    F.transform(tokens("text"), lambda t: F.xxhash64(t))
                ).alias("_tok"),
            )
            .groupBy("doc_id", "_tok")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        per_doc = counts.groupBy("doc_id").agg(
            F.sum("_c").alias("n_tokens"),
            F.count(F.lit(1)).alias("distinct_tokens"),
            F.sum(
                F.round(F.lit(1000000.0) * F.col("_c") * F.log("_c")).cast(
                    "long"
                )
            ).alias("_s"),
        )
        return per_doc.select(
            F.col("doc_id"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("distinct_tokens").cast("long").alias("distinct_tokens"),
            F.round(
                F.lit(1000000.0) * F.log("n_tokens")
                - F.col("_s").cast("double") / F.col("n_tokens")
            )
            .cast("long")
            .alias("entropy_micro"),
        )
    if variant == "hof":
        staged = (
            docs.filter(F.col("text").isNotNull())
            .select(F.col("doc_id"), tokens("text").alias("_toks"))
            .filter(F.size("_toks") >= 1)
            .select(
                "doc_id",
                F.array_sort(
                    F.transform("_toks", lambda t: F.xxhash64(t))
                ).alias("_hs"),
            )
        )
        # run boundaries: 1-based positions i where h[i] starts a new run
        bounded = staged.select(
            "doc_id",
            F.size("_hs").alias("_n"),
            F.expr(
                "filter(sequence(1, size(_hs)), i -> i = 1 OR "
                "element_at(_hs, i) != element_at(_hs, i - 1))"
            ).alias("_bs"),
        )
        s = F.expr(
            "aggregate(zip_with(_bs, "
            "concat(slice(_bs, 2, size(_bs) - 1), array(_n + 1)), "
            "(a, b) -> b - a), 0L, (acc, c) -> acc + "
            "cast(round(1000000.0 * c * ln(c)) as long))"
        )
        return bounded.select(
            F.col("doc_id"),
            F.col("_n").cast("long").alias("n_tokens"),
            F.size("_bs").cast("long").alias("distinct_tokens"),
            F.round(
                F.lit(1000000.0) * F.log("_n") - s.cast("double") / F.col("_n")
            )
            .cast("long")
            .alias("entropy_micro"),
        )
    raise SystemExit(f"unknown variant {variant}")


FULL = {"shipped", "hashdom", "hof"}


def main() -> None:
    variant = sys.argv[1]
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name=f"entropy-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    if variant in FULL and variant != "shipped":
        want = sorted(tuple(r) for r in build(spark, "shipped").collect())
        got = sorted(tuple(r) for r in build(spark, variant).collect())
        assert got == want, f"{variant} diverges from shipped result"

    times = []
    for _ in range(REPS + 1):
        spark.catalog.clearCache()
        df = build(spark, variant)
        t0 = time.perf_counter()
        sc.setJobDescription(f"entropy-ab {variant}")
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
