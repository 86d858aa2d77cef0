"""operators/prefix.py — two-pass distributed prefix sum vs the naive
global-window ground truth (tiny inputs, exact equality)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_wrangling_spark.operators.prefix import prefix_sum


def _naive(df, order_col, value_col, out_col):
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(value_col).over(w).cast("bigint"))


@pytest.mark.parametrize("n_ranges", [1, 3, 8, 64])
def test_matches_global_window(spark, n_ranges):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("v")
    )
    got = {
        r["k"]: r["cum"]
        for r in prefix_sum(df, "k", "v", "cum", n_ranges=n_ranges).collect()
    }
    want = {r["k"]: r["cum"] for r in _naive(df, "k", "v", "cum").collect()}
    assert got == want


def test_sparse_nonzero_ids_and_negatives(spark):
    """Id-range buckets can be empty or start negative — offsets must
    still splice exactly (empty ranges contribute 0 and are absent from
    the totals collect)."""
    rows = [(-50, 5), (-3, 7), (0, 1), (999, 2), (1000, 3), (100000, 4)]
    df = spark.createDataFrame(rows, "k long, v int")
    got = {
        r["k"]: r["cum"] for r in prefix_sum(df, "k", "v", "cum", n_ranges=16).collect()
    }
    assert got == {-50: 5, -3: 12, 0: 13, 999: 15, 1000: 18, 100000: 22}


def test_empty_input(spark):
    df = spark.createDataFrame([], "k long, v int")
    out = prefix_sum(df, "k", "v", "cum")
    assert out.count() == 0
    assert out.schema["cum"].dataType.typeName() == "long"


def test_plan_has_no_single_partition_exchange(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    plan = (
        prefix_sum(df, "k", "v", "cum", n_ranges=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan


def test_null_order_col_fails_fast(spark):
    """Round-8 advisor find: a NULL order key has no position in the
    running-sum order — it used to surface as a bare TypeError from
    int(None) on the collected totals. Now a clear ValueError, checked
    inside the existing bounds aggregate (no extra pass)."""
    df = spark.createDataFrame(
        [(1, 10), (None, 20), (3, 30)], "k long, v int"
    )
    with pytest.raises(ValueError, match="NULL value"):
        prefix_sum(df, "k", "v", "cum")
