"""Query registry: one spec per operator, Spark fn + oracle SQL together.

SURVEY.md §7 "what's hard" item 1: the main correctness risk is drift between
the Spark implementation and the DuckDB oracle SQL. Mitigation: both live in
ONE ``QuerySpec`` — ``__spark_entry__.queries()`` and ``oracle_sql()`` are
views over this registry, never written by hand.

Conventions (driver contract, /root/repo/__spark_entry__.py):
- every computed column is aliased IDENTICALLY in the Spark plan and the SQL;
- floating-point aggregates are rounded (or computed in decimal) on BOTH
  sides so the order-insensitive value hash is stable across engines;
- top-k queries carry a deterministic tiebreak column in the ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    #: DuckDB-runnable ANSI SQL over the pre-registered views, or None for
    #: non-SQL-expressible ops (driver then records a rows-only check).
    oracle: str | None
    doc: str = ""
    #: include in bench.py's headline timing loop
    bench: bool = False


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark_fn, oracle_sql) pair under one name."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return wrap


def queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: spec.spark for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}


def bench_queries() -> dict[str, QuerySpec]:
    _load_all()
    return {name: spec for name, spec in QUERIES.items() if spec.bench}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers specs (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # imports are for their registration side effects
    import data_wrangling_spark.plans.audit_queries  # noqa: F401
    import data_wrangling_spark.plans.cleaning_queries  # noqa: F401
    import data_wrangling_spark.plans.extension_queries  # noqa: F401
    import data_wrangling_spark.plans.osm_queries  # noqa: F401
    import data_wrangling_spark.plans.reference_queries  # noqa: F401
    import data_wrangling_spark.plans.scale_queries  # noqa: F401

    _LOADED = True
