#!/usr/bin/env python3
"""A/B + stage probes: x_text_lm_score at 100x.

Round-13: at 8.4s the lm_score row is the largest non-OSM extras
absolute (0.6x DuckDB — a Spark win, but 10.1x over its own sf0.1
time). The operator's plan references the exploded bigram relation
``bi`` THREE times (the model aggregate, the vocabulary union branch,
and the scoring join's probe side) — without a persist, each reference
recomputes tokenize -> per-token xxhash64 -> slice/zip -> explode
unless ReuseExchange happens to dedupe identical exchange subtrees.
This probe measures whether the recompute is real and whether a
persist of the narrow staged relation pays for itself.

Variants (fresh JVM per variant; clearCache between reps so any
persist is priced per run, same as the bench harness):

    shipped        — registered form (no persist anywhere).
    tokenize       — staged (doc_id, hash array) noop: ONE pass floor.
    explode        — bi (doc_id, h1, h2) noop: one pass + explode.
    model          — the (h1, h2) model aggregate alone.
    persist_staged — persist staged (doc_id, hash array), derive
                     everything from it.
    persist_bi     — persist bi (doc_id, _last, h1, h2), derive
                     everything from it.

Full variants assert value-identity vs the shipped form before timing.

Usage:
    for v in shipped tokenize explode model persist_staged persist_bi; \
        do python scripts/bench_lmscore_ab.py $v; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # match the extras workers

from pyspark.sql import functions as F  # noqa: E402

SCALE_DIR = os.environ.get("LMSCORE_AB_DIR", "/tmp/dws-scale/mult100")
REPS = 3


def _docs(spark):
    from data_wrangling_spark.sources.tables import load_table

    return load_table(spark, SCALE_DIR, "documents")


def _staged(df):
    from data_wrangling_spark.functions import text as TX

    toked = (
        df.filter(F.col("text").isNotNull())
        .select(F.col("doc_id"), TX.tokens("text").alias("_toks"))
        .filter(F.size("_toks") >= 2)
    )
    return toked.select(
        F.col("doc_id"),
        F.transform("_toks", lambda t: F.xxhash64(t)).alias("_hs"),
    )


def _pairs(staged):
    m = F.size("_hs") - F.lit(1)
    return staged.select(
        F.col("doc_id"),
        F.slice("_hs", 1, m).alias("_a"),
        F.slice("_hs", 2, m).alias("_b"),
        F.element_at("_hs", -1).alias("_last"),
    )


def _bi(pairs):
    return pairs.select(
        F.col("doc_id"),
        F.col("_last"),
        F.explode(F.arrays_zip("_a", "_b")).alias("_p"),
    ).select(
        "doc_id",
        "_last",
        F.col("_p._a").alias("_h1"),
        F.col("_p._b").alias("_h2"),
    )


def _score(bi, pairs_for_voc=None):
    """The shipped tail, parameterized by the bi relation (possibly
    persisted). When pairs_for_voc is None the per-doc last-token hashes
    for the vocabulary come from bi itself (groupBy doc max? no —
    bi carries _last on every row; distinct per doc is just bi.select)."""
    big = bi.groupBy("_h1", "_h2").agg(F.count(F.lit(1)).alias("_c12"))
    uni = big.groupBy("_h1").agg(F.sum("_c12").cast("long").alias("_c1"))
    last = (
        pairs_for_voc.select(F.col("_last").alias("_h1"))
        if pairs_for_voc is not None
        else bi.select("doc_id", "_last").groupBy("doc_id").agg(
            F.first("_last").alias("_h1")
        ).select("_h1")
    )
    voc = big.select("_h1").union(last).agg(F.countDistinct("_h1").alias("_v"))
    nll_micro = F.round(
        -F.log(
            (F.col("_c12") + F.lit(1.0)) / (F.col("_c1") + F.col("_v"))
        )
        * 1000000.0,
        0,
    ).cast("bigint")
    return (
        bi.join(big, ["_h1", "_h2"])
        .join(uni, "_h1")
        .join(F.broadcast(voc))
        .select("doc_id", nll_micro.alias("_nll"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("_nll").cast("bigint").alias("nll_micro_sum"),
            F.round(
                F.sum("_nll").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0),
                6,
            ).alias("avg_nll"),
        )
    )


def build(spark, variant):
    from data_wrangling_spark.operators.text_analysis import lm_score_bigram

    docs = _docs(spark)
    if variant == "shipped":
        return lm_score_bigram(docs)
    if variant == "tokenize":
        return _staged(docs)
    if variant == "explode":
        return _bi(_pairs(_staged(docs)))
    if variant == "model":
        bi = _bi(_pairs(_staged(docs)))
        return bi.groupBy("_h1", "_h2").agg(F.count(F.lit(1)).alias("_c12"))
    if variant == "persist_staged":
        staged = _staged(docs).persist()
        pairs = _pairs(staged)
        return _score(_bi(pairs), pairs_for_voc=pairs)
    if variant == "persist_bi":
        bi = _bi(_pairs(_staged(docs))).persist()
        return _score(bi)
    # --- tail stage probes (NOT value-identical; isolate the scoring
    # tail that the persist probes proved dominant: ~8s of the 9.5s
    # wall survives even with bi fully cached) ---
    if variant == "tail_docagg":
        # doc aggregate alone over bi, no model joins
        bi = _bi(_pairs(_staged(docs)))
        return bi.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    if variant == "tail_join_big":
        # one BHJ probe pass + doc agg
        bi = _bi(_pairs(_staged(docs)))
        big = bi.groupBy("_h1", "_h2").agg(F.count(F.lit(1)).alias("_c12"))
        return (
            bi.join(big, ["_h1", "_h2"])
            .groupBy("doc_id")
            .agg(F.sum("_c12").alias("s"))
        )
    if variant == "tail_join_both":
        # both BHJ probe passes + doc agg (= shipped minus voc/BNLJ/log)
        bi = _bi(_pairs(_staged(docs)))
        big = bi.groupBy("_h1", "_h2").agg(F.count(F.lit(1)).alias("_c12"))
        uni = big.groupBy("_h1").agg(F.sum("_c12").cast("long").alias("_c1"))
        return (
            bi.join(big, ["_h1", "_h2"])
            .join(uni, "_h1")
            .groupBy("doc_id")
            .agg(F.sum("_c12").alias("s"), F.sum("_c1").alias("t"))
        )
    if variant == "tail_const_v":
        # full scoring tail with a literal vocabulary size: no voc
        # subtree, no BroadcastNestedLoopJoin — isolates what the
        # 1-row BNLJ + the voc branch cost
        bi = _bi(_pairs(_staged(docs)))
        big = bi.groupBy("_h1", "_h2").agg(F.count(F.lit(1)).alias("_c12"))
        uni = big.groupBy("_h1").agg(F.sum("_c12").cast("long").alias("_c1"))
        nll = F.round(
            -F.log(
                (F.col("_c12") + F.lit(1.0))
                / (F.col("_c1") + F.lit(12345))
            )
            * 1000000.0,
            0,
        ).cast("bigint")
        return (
            bi.join(big, ["_h1", "_h2"])
            .join(uni, "_h1")
            .select("doc_id", nll.alias("_nll"))
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                F.sum("_nll").cast("bigint").alias("nll_micro_sum"),
            )
        )
    raise SystemExit(f"unknown variant {variant}")


FULL = {"shipped", "persist_staged", "persist_bi"}


def main() -> None:
    variant = sys.argv[1]
    from data_wrangling_spark.session import get_spark
    from data_wrangling_spark.operators.text_analysis import lm_score_bigram

    spark = get_spark(app_name=f"lmscore-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    if variant in FULL and variant != "shipped":
        want = sorted(tuple(r) for r in lm_score_bigram(_docs(spark)).collect())
        got = sorted(tuple(r) for r in build(spark, variant).collect())
        assert got == want, f"{variant} diverges from shipped result"
        spark.catalog.clearCache()

    times = []
    for _ in range(REPS + 1):
        spark.catalog.clearCache()
        df = build(spark, variant)
        t0 = time.perf_counter()
        sc.setJobDescription(f"lmscore-ab {variant}")
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
