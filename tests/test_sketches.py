"""HLL sketch quality: union-of-daily-sketches weekly estimate must be
within the sketch's error bound of the exact distinct count (default
lgConfigK=12 → ~1.6% relative standard error; assert a generous 5%)."""

from __future__ import annotations

from data_wrangling_spark.plans.registry import QUERIES, queries
from tests.conftest import SF_DIR

queries()


def test_hll_weekly_union_error_bound(spark):
    rows = QUERIES["x_sketch_hll_weekly_users"].spark(spark, SF_DIR).collect()
    assert rows, "no weeks produced"
    for r in rows:
        err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert err <= 0.05, f"week {r.week}: approx {r.approx_users} vs exact {r.exact_users}"


def test_approx_percentile_error_bound(spark):
    """t-digest-style approx_percentile (the mergeable scale path the
    ext_percentiles doc points to) stays within 1% relative error of the
    exact interpolated percentile on this distribution."""
    from pyspark.sql import functions as F
    from data_wrangling_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    row = orders.agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01, row
