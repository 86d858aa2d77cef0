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
