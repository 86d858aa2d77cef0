"""Funnel, cohort-retention, and table-profile unit semantics on
constructed inputs (the registry oracle tests pin them against DuckDB;
these pin the hand-checkable cases — especially the ORDER requirement
that distinguishes a funnel from a per-type count)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, et) for i, (ts, u, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def _t(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_funnel_order_matters(spark):
    from data_wrangling_spark.operators.temporal import funnel_steps

    rows = [
        # user 1 converts in order: view d1, click d2, purchase d3
        (_t(1), 1, "view"), (_t(2), 1, "click"), (_t(3), 1, "purchase"),
        # user 2 purchases BEFORE clicking: no purchase conversion
        (_t(1), 2, "view"), (_t(3), 2, "click"), (_t(2), 2, "purchase"),
        # user 3 only views
        (_t(1), 3, "view"),
    ]
    got = {r.step: r.n_users for r in
           funnel_steps(_events(spark, rows), ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_conv_ppm(spark):
    from data_wrangling_spark.operators.temporal import funnel_steps

    rows = [
        (_t(1), u, "view") for u in range(4)
    ] + [(_t(2), u, "click") for u in range(2)]
    out = {r.step: r for r in
           funnel_steps(_events(spark, rows), ["view", "click"]).collect()}
    assert out["view"].conv_ppm == 1000000
    assert out["click"].conv_ppm == 500000


def test_funnel_same_timestamp_does_not_convert(spark):
    from data_wrangling_spark.operators.temporal import funnel_steps

    # click at EXACTLY the first view instant: strictly-after fails
    rows = [(_t(1), 1, "view"), (_t(1), 1, "click")]
    got = {r.step: r.n_users for r in
           funnel_steps(_events(spark, rows), ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 0}


def test_cohort_week_zero_is_cohort_size(spark):
    from data_wrangling_spark.operators.temporal import cohort_retention

    # both users first appear in the week of Mon 2024-01-01
    rows = [(_t(2), 1, "view"), (_t(3), 2, "view"),
            (_t(9), 1, "view")]  # user 1 returns the following week
    out = cohort_retention(_events(spark, rows)).collect()
    cells = {(str(r.cohort_week), r.week_offset): r for r in out}
    w0 = cells[("2024-01-01", 0)]
    assert w0.n_active == 2 and w0.n_cohort == 2 and w0.retention_ppm == 1000000
    w1 = cells[("2024-01-01", 1)]
    assert w1.n_active == 1 and w1.retention_ppm == 500000


def test_profile_table_counts_and_string_domain(spark):
    from data_wrangling_spark.operators.audit import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (10, "b")], "k long, s string"
    )
    out = {r.column: r for r in
           profile_table(df, [("k", F.col("k")), ("s", F.col("s"))]).collect()}
    assert out["k"].n_rows == 3 and out["k"].n_null == 0
    assert out["k"].n_distinct == 3
    # string-domain min/max by design: '10' < '2'
    assert out["k"].min_value == "1" and out["k"].max_value == "2"
    assert out["s"].n_null == 1 and out["s"].n_distinct == 2
    assert out["s"].min_value == "a" and out["s"].max_value == "b"


def test_profile_table_derived_input_form_matches_union_form(spark):
    """input_is_scan=False (round-7 advisor find: the union form
    re-executes the upstream plan per column — wrong trade for derived
    inputs) must produce IDENTICAL rows via the single-pass Expand
    aggregate, including the empty-input shape."""
    from data_wrangling_spark.operators.audit import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (10, "b"), (10, "a")], "k long, s string"
    )
    cols = [("k", F.col("k")), ("s", F.col("s"))]
    key = lambda r: (r.column, r.n_rows, r.n_null, r.n_distinct,  # noqa: E731
                     r.min_value, r.max_value)
    union_rows = [key(r) for r in profile_table(df, cols).collect()]
    single_rows = [
        key(r) for r in profile_table(df, cols, input_is_scan=False).collect()
    ]
    assert union_rows == single_rows

    empty = spark.createDataFrame([], "k long, s string")
    e_union = [key(r) for r in profile_table(empty, cols).collect()]
    e_single = [
        key(r) for r in profile_table(empty, cols, input_is_scan=False).collect()
    ]
    assert e_union == e_single
