"""A/B: the registered hash-domain boilerplate_spans (count document
frequency on 64-bit gram hashes, reconstruct span strings only from one
representative doc per candidate span) vs the pre-round-7 string-domain
form, preserved inline below.

Round-7 measurement at 100x (3-rep medians, quiet box):
string-domain 23.8s vs hash-domain 16.7s, identical top-20.

Usage: python scripts/bench_boilerplate_ab.py /tmp/dws-scale/mult100
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from data_wrangling_spark.functions import text as TX  # noqa: E402
from data_wrangling_spark.operators.dedup import (  # noqa: E402
    shingles_from_tokens,
)
from data_wrangling_spark.operators.text_analysis import (  # noqa: E402
    boilerplate_spans,
)
from data_wrangling_spark.session import get_spark  # noqa: E402
from data_wrangling_spark.sources.tables import load_table  # noqa: E402


def boilerplate_spans_string_domain(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_docs: int = 2,
    top: int = 20,
) -> DataFrame:
    """The pre-round-7 form: aggregate keyed on the built gram STRINGS
    (26M concat_ws allocations at 100x that compact to 27k spans)."""
    toked = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), TX.tokens(text_col).alias("_toks")
    )
    spans = toked.select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("_toks"), n=n)).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), "span")
        .limit(top)
        .select("span", F.col("n_docs").cast("bigint").alias("n_docs"))
    )


def timeit(fn, reps=3) -> float:
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 2)


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dws-scale/mult100"
    spark = get_spark(app_name="boiler-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, d, "documents")

    legacy = timeit(
        lambda: boilerplate_spans_string_domain(docs)
        .write.format("noop").mode("overwrite").save()
    )
    hashed = timeit(
        lambda: boilerplate_spans(docs).write.format("noop")
        .mode("overwrite").save()
    )
    a = [(r.span, r.n_docs)
         for r in boilerplate_spans_string_domain(docs).collect()]
    b = [(r.span, r.n_docs) for r in boilerplate_spans(docs).collect()]
    print(
        f"{d}: string_domain={legacy}s hashed={hashed}s "
        f"identical_top{len(a)}={a == b}"
    )
    if a != b:
        print("STR:", a[:5])
        print("HSH:", b[:5])


if __name__ == "__main__":
    main()
