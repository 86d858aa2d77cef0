#!/usr/bin/env python3
"""A/B: md5-per-occurrence vs md5-per-DISTINCT-token for the hashed
linear classifier (round-14, verdict item 6).

The x_eval_* floor is the md5 bucket evaluation inside
hashed_linear_score: ~1.5-2.0s per 26.6M token OCCURRENCES at 100x,
oracle-pinned semantics (first 4 hex chars of md5 % 4096 → Knuth
weight). Tokens repeat within a document, so the weight can be
evaluated once per distinct token PER DOCUMENT and multiplied by the
run length — value-identical because the weight is a pure function of
the token and integer multiplication distributes over the sum:

    Σ_occurrences w(t)  ==  Σ_runs w(t) · len(run)

Variants (fresh JVM each; `check` asserts value-identity at sf0.01):

    occ   — shipped r13 form: aggregate(transform(toks, w), 0, +)
            (one md5 per occurrence, zero shuffles)
    dedup — array_sort the token array, find run starts with a
            sequence+filter HOF, zip_with run starts against shifted
            starts for run lengths, evaluate w once per run
            (one md5 per per-doc distinct token + one string sort)

The corpus-vocabulary alternative (evaluate md5 once per DISTINCT
token corpus-wide, attach back by join) is NOT probed: the lm_score
precedent showed the occurrence-scale probe join costs ~2.9s by
itself — more than the whole md5 floor — and an in-array map literal
needs an eager vocabulary collect that does not stay literal-sized at
a 100 TB vocabulary.

Usage:
    python scripts/bench_evalmd5_ab.py check        # sf0.01 identity
    for v in occ dedup occ dedup; do python scripts/bench_evalmd5_ab.py $v; done
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/dws-scale/mult100")

N_BUCKETS = 4096
W_MULT = 2654435761
W_MOD = 2001


def _w(tok):
    bucket = (
        F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("long") % N_BUCKETS
    )
    return bucket * W_MULT % W_MOD - (W_MOD - 1) // 2


def build(spark, sf_dir: str, variant: str):
    from data_wrangling_spark.functions import text as TX
    from data_wrangling_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.filter(F.col("text").isNotNull())
        .select(F.col("doc_id"), TX.tokens("text").alias("_toks"))
        .filter(F.size("_toks") >= 1)
    )
    if variant == "occ":
        s = F.aggregate(
            F.transform("_toks", _w), F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
    elif variant == "dedup":
        srt = F.array_sort("_toks")
        # 1-based positions of run starts in the sorted array
        starts = F.filter(
            F.sequence(F.lit(1), F.size(srt)),
            lambda i: (i == 1)
            | (F.element_at(srt, i) != F.element_at(srt, i - 1)),
        )
        # each run ends where the next one starts (last: n+1)
        ends = F.concat(
            F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
            F.array(F.size(srt) + 1),
        )
        s = F.aggregate(
            F.zip_with(
                starts, ends,
                lambda a, b: _w(F.element_at(srt, a))
                * (b - a).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
    else:
        raise SystemExit(f"unknown variant {variant!r}")
    n = F.size("_toks").cast("long")
    score = F.round(F.lit(1000.0) * s / n).cast("long")
    return base.select(
        "doc_id",
        n.alias("n_tokens"),
        score.alias("score_milli"),
        F.when(score > 0, F.lit("keep")).otherwise(F.lit("drop"))
        .alias("label"),
    )


def main() -> None:
    variant = sys.argv[1]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from data_wrangling_spark.session import get_spark

    if variant == "check":
        spark = get_spark(app_name="evalmd5-check")
        spark.sparkContext.setLogLevel("ERROR")
        sf = "/root/testdata/sf0.01"
        a = sorted(map(tuple, build(spark, sf, "occ").collect()))
        b = sorted(map(tuple, build(spark, sf, "dedup").collect()))
        assert a == b, "variants differ"
        # the shipped operator must also agree
        from data_wrangling_spark.operators.text_analysis import (
            hashed_linear_score,
        )
        from data_wrangling_spark.sources.tables import load_table

        c = sorted(
            map(tuple, hashed_linear_score(
                load_table(spark, sf, "documents")).collect())
        )
        assert a == c, "probe 'occ' drifted from the shipped operator"
        print(f"identity ok over {len(a)} rows")
        spark.stop()
        return

    spark = get_spark(app_name=f"evalmd5-ab-{variant}")
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
