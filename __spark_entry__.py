"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Both maps are views over the engine's single query registry
(data_wrangling_spark/plans/registry.py) — each operator's Spark plan and
oracle SQL live in one ``QuerySpec``, so they cannot drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_wrangling_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q4-shaped top-10 contributors across a union) on
    /root/testdata/sf0.001; exercises scan → project → union → hash agg →
    top-k, i.e. the core of the reference's query surface."""
    from data_wrangling_spark.plans.reference_queries import q4_top_users

    return q4_top_users(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.11."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; omitted keys (LSH / streaming /
    multimodal) get the driver's weaker rows-only check."""
    return registry.oracle_sql()
