#!/usr/bin/env python3
"""Stage probes + rework A/B: x_dedup_incremental at 100x.

Round-11 verdict item 2: the 100x solo row is 36.0s = 2.1x DuckDB —
the largest absolute >2x row — with the docstring claiming the wall is
"fingerprint + posting build" but no published stage split. This
script splits the wall and A/Bs a near-stage restructure.

At 100x the max_df=100 valve prunes EVERY shingle (replication
multiplies df), so the pair join does zero candidate work; what's left
is exactly the machinery this script times.

Stage probes (shipped shape decomposition; each its own fresh JVM):

    fp_exact   — fingerprint both sides + the exact equi join
    grams      — posting build: tokenize + gram-hash + explode, both
                 sides, noop sink (no dedup logic)
    heavy      — the stop-shingle aggregate alone
                 (union of both posting sets -> groupBy(_sh) -> f>100)
    prune      — postings LEFT ANTI heavy, both sides (the shipped
                 prune path, including however many times Catalyst
                 recomputes the heavy subtree)
    near       — the full near stage (prune + sizes + pair join +
                 threshold + min-iid)
    full       — the shipped registered query

Rework variants:

    full_bcast — shipped shape, heavy wrapped in F.broadcast():
                 the anti-joins become broadcast hash joins, so the
                 full posting sets never shuffle for the prune.
                 heavy <= total_postings/max_df rows (8-byte longs) —
                 broadcastable at bench scales, NOT at 100 TB
                 (size-gate if shipped).
    full_reuse — one-exchange-per-side restructure: per-side partial
                 df counts (f = f_new + f_idx via outer join of two
                 groupBy(_sh) aggregates), prune as a co-partitioned
                 join against the LIGHT set, pair join riding the same
                 (_sh) partitioning — every near-stage step hangs off
                 ONE exchange per posting side (ReusedExchange), no
                 repeated heavy subtree, no broadcast-size assumption.

Usage (fresh JVM per variant):
    for v in fp_exact grams heavy prune near full full_bcast full_reuse; do
        python scripts/bench_incr_ab.py $v; done

MEASURED (2026-08-16, 100x, fresh JVM per variant, median of 3):

Layout v1 (the committed r11 table's 2-file documents layout):
    fp_exact 37.2s | grams 6.9s | heavy 7.4s | prune 9.7s | near 11.2s
Layout v2 (bytes+rows file formula, 125 files):
    fp_exact 44.2s | grams 1.5s | heavy 1.8s | prune 4.0s | near 4.8s
    full 42.1s | full_bcast 46.8s | full_reuse 41.5s

The layout fix collapsed every POSTING stage ~4x but fp_exact did not
move — the fingerprint wall was parallelism-INDEPENDENT, so it was
never scan starvation. Micro probes found it: regexp_replace with the
negated class [^a-z0-9 ] costs 21.5s alone (~125 ns/char on the regex
FAILURE path — the corpus is already clean, so the matcher attempts
and fails at every position) while the often-matching \s+ squeeze
costs 0.8s. Rephrasing the strip as extract-the-keep-runs
(array_join(regexp_extract_all('[a-z0-9 ]+'), '')) is value-identical
by construction and rides the success path: 0.66s.

After the normalized() fix (functions/text.py):
    fp_exact 1.6s | full 5.6-6.0s | full_bcast 5.3s | full_reuse 5.7s

The three near-stage structures are within one JVM band of each other,
so the shipped shape stays (full_bcast would also assume a
broadcastable stop-shingle set, false at 100 TB). The committed 36.0s
/ 2.1x row was therefore: 2-task scan starvation (layout) stacked on
the regex failure-path cliff (normalized) — both fixed, neither was
the posting machinery the r11 doc blamed.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/dws-scale/mult100")
N = 3
MAX_DF = 100
THRESHOLD = 0.3


def _bases(spark, sf_dir):
    from data_wrangling_spark.functions.text import fingerprint, tokens
    from data_wrangling_spark.operators.dedup import gram_hashes_from_tokens
    from data_wrangling_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    new_df = docs.filter(F.col("doc_id") % 5 == 0)
    index_df = docs.filter(F.col("doc_id") % 5 != 0)
    new_base = new_df.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("_nid"),
        fingerprint("text").alias("_nfp"),
        tokens("text").alias("_toks"),
    ).select(
        "_nid", "_nfp",
        gram_hashes_from_tokens(F.col("_toks"), N).alias("_nsh"),
    )
    idx_base = index_df.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("_iid"),
        fingerprint("text").alias("_ifp"),
        tokens("text").alias("_toks"),
    ).select(
        "_iid", "_ifp",
        gram_hashes_from_tokens(F.col("_toks"), N).alias("_ish"),
    )
    return new_base, idx_base


def _postings(new_base, idx_base):
    sh_new = new_base.select(
        "_nid", F.explode_outer("_nsh").alias("_sh")
    ).filter(F.col("_sh").isNotNull())
    sh_idx = idx_base.select(
        "_iid", F.explode_outer("_ish").alias("_sh")
    ).filter(F.col("_sh").isNotNull())
    return sh_new, sh_idx


def _near_shipped(sh_new, sh_idx, bcast: bool):
    heavy = (
        sh_new.select("_sh")
        .unionAll(sh_idx.select("_sh"))
        .groupBy("_sh")
        .agg(F.count(F.lit(1)).alias("_f"))
        .filter(F.col("_f") > MAX_DF)
        .select("_sh")
    )
    if bcast:
        heavy = F.broadcast(heavy)
    sh_new = sh_new.join(heavy, "_sh", "left_anti")
    sh_idx = sh_idx.join(heavy, "_sh", "left_anti")
    return _pairs_to_cand(sh_new, sh_idx)


def _near_reuse(sh_new, sh_idx):
    # per-side df partials: each side's postings shuffle ONCE on _sh;
    # every later step (f-combine, prune, pair join) rides that same
    # partitioning via ReusedExchange
    f_new = sh_new.groupBy("_sh").agg(F.count(F.lit(1)).alias("_fn"))
    f_idx = sh_idx.groupBy("_sh").agg(F.count(F.lit(1)).alias("_fi"))
    light = (
        f_new.join(f_idx, "_sh", "full_outer")
        .filter(
            F.coalesce(F.col("_fn"), F.lit(0))
            + F.coalesce(F.col("_fi"), F.lit(0))
            <= MAX_DF
        )
        .select("_sh")
    )
    sh_new = sh_new.join(light, "_sh")
    sh_idx = sh_idx.join(light, "_sh")
    return _pairs_to_cand(sh_new, sh_idx)


def _pairs_to_cand(sh_new, sh_idx):
    sz_new = sh_new.groupBy("_nid").agg(F.count(F.lit(1)).alias("_na"))
    sz_idx = sh_idx.groupBy("_iid").agg(F.count(F.lit(1)).alias("_nb"))
    pairs = (
        sh_new.join(sh_idx, "_sh")
        .groupBy("_nid", "_iid")
        .agg(F.count(F.lit(1)).alias("_common"))
        .join(sz_new, "_nid")
        .join(sz_idx, "_iid")
    )
    return (
        pairs.filter(
            F.col("_common").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_common"))
            >= F.lit(THRESHOLD)
        )
        .groupBy("_nid")
        .agg(F.min("_iid").alias("_near_match"))
    )


def _assemble(new_base, idx_base, cand):
    fp_idx = idx_base.groupBy("_ifp").agg(F.min("_iid").alias("_exact_match"))
    exact = new_base.join(
        fp_idx, new_base["_nfp"] == fp_idx["_ifp"], "left"
    ).select("_nid", "_exact_match")
    return exact.join(cand, "_nid", "left").select(
        F.col("_nid").alias("doc_id"),
        F.when(F.col("_exact_match").isNotNull(), F.lit("exact_dup"))
        .when(F.col("_near_match").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("fresh"))
        .alias("status"),
        F.coalesce("_exact_match", "_near_match").alias("match_id"),
    ).orderBy("doc_id")


def build(spark, sf_dir: str, variant: str):
    # fingerprint micro-stages (round-12: fp_exact measured 37-44s at
    # 100x REGARDLESS of the scan layout fix — parallelism-independent,
    # so the wall is not scan starvation; these isolate which piece)
    if variant.startswith("micro_"):
        from data_wrangling_spark.functions.text import normalized
        from data_wrangling_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
        if variant == "micro_scan":
            return docs.select(F.length("text").alias("n"))
        if variant == "micro_lower":
            return docs.select(F.length(F.lower(F.col("text"))).alias("n"))
        if variant == "micro_regex1":
            return docs.select(F.length(
                F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
            ).alias("n"))
        if variant == "micro_norm":
            return docs.select(F.length(normalized("text")).alias("n"))
        if variant == "micro_md5":
            return docs.select(F.length(F.md5(F.col("text"))).alias("n"))
        if variant == "micro_regex2":
            return docs.select(F.length(
                F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", "")
            ).alias("n"))
        if variant == "micro_regex2_raw":
            return docs.select(F.length(
                F.regexp_replace(F.col("text"), r"[^a-z0-9 ]", "")
            ).alias("n"))
        if variant == "micro_chain":
            return docs.select(F.length(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), r"\s+", " "),
                    r"[^a-z0-9 ]", "",
                )
            ).alias("n"))
        if variant == "micro_extract":
            # complement form: DELETING the chars of [^a-z0-9 ] equals
            # CONCATENATING the maximal [a-z0-9 ]+ runs — flips the
            # regex from failure-scans at every position (slow path)
            # to frequent successes (the \s+ behavior, 0.8s)
            return docs.select(F.length(F.array_join(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit("[a-z0-9 ]+"), 0
                ), "",
            )).alias("n"))
        if variant == "micro_fp2":
            from data_wrangling_spark.functions.text import fingerprint_v2

            return docs.select(F.length(fingerprint_v2("text")).alias("n"))
        if variant == "micro_two_cols":
            return docs.select(
                F.length(F.regexp_replace(F.col("text"), r"\s+", " "))
                .alias("n1"),
                F.length(F.regexp_replace(F.col("text"), r"[^a-z0-9 ]", ""))
                .alias("n2"),
            )
        if variant == "micro_fp":
            from data_wrangling_spark.functions.text import fingerprint

            return docs.select(F.length(fingerprint("text")).alias("n"))
        raise SystemExit(f"unknown micro variant {variant!r}")
    new_base, idx_base = _bases(spark, sf_dir)
    if variant == "fp_exact":
        fp_idx = idx_base.groupBy("_ifp").agg(
            F.min("_iid").alias("_exact_match")
        )
        return new_base.join(
            fp_idx, new_base["_nfp"] == fp_idx["_ifp"], "left"
        ).select("_nid", "_exact_match")
    sh_new, sh_idx = _postings(new_base, idx_base)
    if variant == "grams":
        return sh_new.select(F.col("_sh")).unionAll(sh_idx.select("_sh"))
    if variant == "heavy":
        return (
            sh_new.select("_sh").unionAll(sh_idx.select("_sh"))
            .groupBy("_sh").agg(F.count(F.lit(1)).alias("_f"))
            .filter(F.col("_f") > MAX_DF).select("_sh")
        )
    if variant == "prune":
        heavy = (
            sh_new.select("_sh").unionAll(sh_idx.select("_sh"))
            .groupBy("_sh").agg(F.count(F.lit(1)).alias("_f"))
            .filter(F.col("_f") > MAX_DF).select("_sh")
        )
        return sh_new.join(heavy, "_sh", "left_anti").select("_sh").unionAll(
            sh_idx.join(heavy, "_sh", "left_anti").select("_sh")
        )
    if variant == "near":
        return _near_shipped(sh_new, sh_idx, bcast=False)
    if variant == "full":
        return _assemble(
            new_base, idx_base, _near_shipped(sh_new, sh_idx, bcast=False)
        )
    if variant == "full_bcast":
        return _assemble(
            new_base, idx_base, _near_shipped(sh_new, sh_idx, bcast=True)
        )
    if variant == "full_reuse":
        return _assemble(new_base, idx_base, _near_reuse(sh_new, sh_idx))
    raise SystemExit(f"unknown variant {variant!r}")


def main() -> None:
    variant = sys.argv[1]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from data_wrangling_spark.session import get_spark

    spark = get_spark(app_name=f"incr-ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    df = build(spark, SF_DIR, variant)

    def _run():
        df.write.format("noop").mode("overwrite").save()

    _run()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _run()
        runs.append(time.perf_counter() - t0)
    print(f"{variant}: median {statistics.median(runs):.3f}s "
          f"runs {[round(r, 3) for r in runs]}")
    spark.stop()


if __name__ == "__main__":
    main()
