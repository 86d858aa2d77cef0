"""A/B: prefix-filtered exact Jaccard join (jaccard_pairs_prefix) vs
the plain inverted-index form (ngram_jaccard_pairs) on the UNBOUNDED
documents corpus at pre-materialized scale dirs (see bench_scale.py).

The scaled corpus is replication-dense (every base doc copied MULT
times bit-identically), so shingle document frequencies scale with
MULT and the plain join's f²-pair term grows quadratically in scale —
the exact blow-up the max_df valve cuts by CHANGING semantics and the
prefix scheme cuts WITHOUT changing them. Also reports the candidate
count each form feeds its verification stage, which is the structural
number behind the wall-clock.

Usage: python scripts/bench_jaccard_ab.py /tmp/dws-scale/mult10 [more]
Env:   SPARK_GRAFT_JACCARD_PLAIN=0 skips the plain form (it may be
       pathological at the larger dirs — record prefix-only there);
       SPARK_GRAFT_JACCARD_T sets the threshold (default 0.5 — at low
       thresholds the prefix is most of the document by the theorem
       itself, so BOTH forms grind on a replication-dense corpus and
       the A/B measures nothing; 0.5 is also the realistic near-dup
       cutoff at scale).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_wrangling_spark.session import get_spark  # noqa: E402

REPS = 3


def timeit(fn) -> float:
    fn()  # warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    from data_wrangling_spark.operators.dedup import (
        jaccard_pairs_prefix,
        ngram_jaccard_pairs,
    )

    dirs = sys.argv[1:] or ["/tmp/dws-scale/mult10"]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    plain_on = os.environ.get("SPARK_GRAFT_JACCARD_PLAIN", "1") != "0"
    thr = float(os.environ.get("SPARK_GRAFT_JACCARD_T", "0.5"))
    spark = get_spark(app_name="jaccard-ab")
    spark.sparkContext.setLogLevel("ERROR")
    from data_wrangling_spark.operators.dedup import jaccard_pairs_collapsed

    for d in dirs:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        n_docs = docs.count()
        pref = jaccard_pairs_prefix(docs, "doc_id", "text", n=3, threshold=thr)
        t_pref = timeit(lambda: pref.write.format("noop").mode("overwrite").save())
        n_pairs = pref.count()
        out = {"dir": d, "docs": n_docs, "t": thr, "pairs": n_pairs, "prefix_s": t_pref}
        # round-9: the collapse-then-prefix composition registered as
        # x_dedup_jaccard_collapsed — on the replication-dense scaled
        # corpus the intra-group quadratic mass bypasses gram work
        # entirely, which is where the round-8 A/B said the win lives
        coll = jaccard_pairs_collapsed(
            docs, "doc_id", "text", n=3, threshold=thr
        )
        out["collapsed_s"] = timeit(
            lambda: coll.write.format("noop").mode("overwrite").save()
        )
        out["ratio_prefix_over_collapsed"] = round(
            t_pref / out["collapsed_s"], 2
        ) if out["collapsed_s"] else None
        if plain_on:
            plain = ngram_jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=thr
            )
            out["plain_s"] = timeit(
                lambda: plain.write.format("noop").mode("overwrite").save()
            )
            out["ratio_plain_over_prefix"] = round(
                out["plain_s"] / t_pref, 2
            ) if t_pref else None
            out["ratio_plain_over_collapsed"] = round(
                out["plain_s"] / out["collapsed_s"], 2
            ) if out["collapsed_s"] else None
        print(out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
