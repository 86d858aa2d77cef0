"""Oracle-diff tests (SURVEY.md §5 'primary'): every registered query with
an oracle is checked against DuckDB at sf0.001, exactly like the driver's
sf0.01 gate but faster. Registry-driven: a new @register'd query is picked
up automatically."""

from __future__ import annotations

import pytest

from data_wrangling_spark.plans.registry import QUERIES, queries
from tests.conftest import assert_matches_oracle

queries()  # force registration


ORACLED = sorted(name for name, spec in QUERIES.items() if spec.oracle is not None)
ROWS_ONLY = sorted(name for name, spec in QUERIES.items() if spec.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_matches_duckdb_oracle(spark, duck, name):
    spec = QUERIES[name]
    assert_matches_oracle(spark, duck, spec.spark, spec.oracle)


# since round 5 every registered query carries an oracle (the seeded
# hash/sketch families via plans/seeded_goldens.py pinned snapshots);
# the sentinel keeps this smoke net alive for future rows-only entries
# without a permanent skip in the suite
@pytest.mark.parametrize("name", ROWS_ONLY or ["<all-queries-oracled>"])
def test_rows_only_smoke(spark, name):
    if name == "<all-queries-oracled>":
        return
    spec = QUERIES[name]
    df = spec.spark(spark, "/root/testdata/sf0.001")
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", ORACLED + ROWS_ONLY)
def test_driver_hashable_schema(spark, name):
    """The driver's value-hash canonicalizer dies on unhashable cells
    (round-1 ERRs: array<float> feature, array<struct> tags). Registered
    queries must project container types to strings (to_json/concat_ws);
    the typed forms stay available on the library functions."""
    from pyspark.sql import types as T

    df = QUERIES[name].spark(spark, "/root/testdata/sf0.001")
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"{name} outputs container-typed columns {bad}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert set(df.columns) == {"user_id", "cnt"}


def test_registry_consistency():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 10


def test_driver_window_order():
    """The driver gates correctness on the FIRST 50 entries of queries();
    DRIVER_WINDOW pins which 50 — every name must exist, be unique, and
    lead the iteration order, with most of the window oracled."""
    import __spark_entry__ as e
    from data_wrangling_spark.plans.registry import DRIVER_WINDOW

    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    q = e.queries()
    assert list(q)[:50] == DRIVER_WINDOW
    o = e.oracle_sql()
    oracled_in_window = sum(1 for n in DRIVER_WINDOW if n in o)
    assert oracled_in_window >= 40
