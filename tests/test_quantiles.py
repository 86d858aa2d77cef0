"""exact_quantiles: value parity with Spark's exact percentile aggregate
(the semantics we refused only for its plan, not its answers), edge
cases, and refinement-level bounds."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_wrangling_spark.operators.quantiles import (
    _round_half_up,
    exact_quantiles,
)

PROBS = [0.1, 0.25, 0.5, 0.75, 0.9]


def _spark_percentile(spark, values, probs):
    df = spark.createDataFrame([(int(v),) for v in values], "v bigint")
    arr = ", ".join(str(p) for p in probs)
    return df.agg(F.expr(f"percentile(v, array({arr}))")).first()[0]


def _assert_interp_eq(got, want, ctx="", values=None):
    """Equal, with a 2-ulp allowance ONLY where duplicate neighbouring
    order statistics can occur. exact_quantiles interpolates with
    lo*(1-f) + hi*f — BIT-IDENTICAL to DuckDB quantile_cont, the
    driver oracle's binding formula (pinned exactly in
    test_interpolation_is_duckdb_exact below). Spark's own percentile
    aggregates (value -> count) buckets, so when both neighbouring
    order statistics are the same value it returns it with NO
    arithmetic (distinct neighbours use the same product form) — e.g.
    values [109, 109] at p=0.1 give 109.00000000000001 (DuckDB and
    this repo) vs exactly 109.0 (Spark), the Hypothesis find that
    created this helper; the drift is <=~1 ulp of the value and only
    in duplicate-value cases. So: pass the input ``values`` where
    available — when they are all DISTINCT the comparison is exact
    ``==`` (advice find: a blanket 2-ulp allowance is ~4096 absolute
    at int64 extremes, silently weakening the exactness tests); only
    duplicate-value inputs (or unknown values, e.g. per-group) get
    the 2-ulp tolerance. The DuckDB comparison stays exact."""
    assert len(got) == len(want), (ctx, got, want)
    exact = values is not None and len(set(values)) == len(values)
    for g, w in zip(got, want):
        w = float(w)
        if exact:
            assert g == w, (ctx, got, want)
        else:
            tol = 2 * math.ulp(max(abs(g), abs(w), 1.0))
            assert abs(g - w) <= tol, (ctx, got, want)


@pytest.mark.parametrize(
    "values",
    [
        list(range(100)),
        [5] * 40,                          # all-equal
        [-(10**9), -3, 0, 7, 10**9],       # huge range -> multi-level
        [1, 2],                            # n=2 interpolation
        [42],                              # n=1: every quantile = 42
        [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5], # duplicates
    ],
)
def test_matches_spark_exact_percentile(spark, values):
    got = exact_quantiles(
        spark.createDataFrame([(int(v),) for v in values], "v bigint"),
        "v",
        PROBS,
        strata=16,  # tiny strata forces multiple refinement levels
    )
    want = _spark_percentile(spark, values, PROBS)
    _assert_interp_eq(got, want, values, values=values)


def test_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(None,), (1,), (None,), (3,)], "v bigint"
    )
    assert exact_quantiles(df, "v", [0.5]) == [2.0]


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "v bigint")
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [0.5])


def test_round_half_up_matches_spark_round(spark):
    cases = [4499.7, 0.00005, 2.5e-5, 123.45675, 1.0000499999]
    want = (
        spark.createDataFrame([(c,) for c in cases], "v double")
        .select(F.round("v", 4).alias("r"))
        .collect()
    )
    for c, row in zip(cases, want):
        assert _round_half_up(c, 4) == row["r"], c


def test_orders_cents_parity_sf0001(spark):
    """The exact use ext_deciles_scalable makes of the operator, against
    Spark's percentile on the same derived column."""
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    probs = [i / 10 for i in range(1, 10)]
    got = exact_quantiles(c, "cents", probs)
    want = c.agg(
        F.expr(
            "percentile(cents, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        )
    ).first()[0]
    assert [_round_half_up(g, 4) for g in got] == [
        _round_half_up(float(w), 4) for w in want
    ]


def test_grouped_matches_spark_percentile_per_group(spark):
    import random

    rng = random.Random(7)
    rows = [
        (g, rng.randrange(-1000, 10**7))
        for g in ("A", "B", "C")
        for _ in range(rng.randrange(5, 60))
    ]
    df = spark.createDataFrame(rows, "g string, v bigint")
    from data_wrangling_spark.operators.quantiles import exact_quantiles_grouped

    got = exact_quantiles_grouped(df, "g", "v", PROBS, strata=16)
    want = {
        r["g"]: r["qs"]
        for r in df.groupBy("g")
        .agg(
            F.expr(
                f"percentile(v, array({', '.join(str(p) for p in PROBS)}))"
            ).alias("qs")
        )
        .collect()
    }
    assert set(got) == set(want)
    for g in got:
        _assert_interp_eq(got[g], want[g], g)


def test_grouped_skips_null_only_groups(spark):
    df = spark.createDataFrame(
        [("A", 1), ("A", 3), ("B", None)], "g string, v bigint"
    )
    from data_wrangling_spark.operators.quantiles import exact_quantiles_grouped

    got = exact_quantiles_grouped(df, "g", "v", [0.5])
    assert got == {"A": [2.0]}


def test_huge_value_domain_exact(spark):
    """Review regression: values spanning > 2^53 used to crash ('rank
    outside histogram mass') because executors bucketed with double
    division while the driver narrowed with exact ints. Integer `div`
    bucketing must resolve the full 64-bit domain."""
    values = [0, 2**60 - 1, 2**60, 2**60 + 1, 2**62 + 3]
    got = exact_quantiles(
        spark.createDataFrame([(v,) for v in values], "v bigint"),
        "v",
        [0.25, 0.5, 0.75],
        strata=16,
    )
    want = _spark_percentile(spark, values, [0.25, 0.5, 0.75])
    _assert_interp_eq(got, want, values, values=values)


def test_span_past_long_max_no_ansi_overflow(spark):
    """Advice regression: a column spanning more than Long.MAX values
    ([-2^62, 0, 2^62]: span 2^63 + 1) used to raise ARITHMETIC_OVERFLOW
    under ANSI (Spark 4 default) because the stratum offset `_v - lo`
    was computed in bigint. Bucketing now runs in DECIMAL(38,0)."""
    values = [-(2**62), 0, 2**62]
    got = exact_quantiles(
        spark.createDataFrame([(v,) for v in values], "v bigint"),
        "v",
        [0.25, 0.5, 0.75],
        strata=16,
    )
    want = _spark_percentile(spark, values, [0.25, 0.5, 0.75])
    _assert_interp_eq(got, want, values, values=values)


def test_full_int64_extremes_exact(spark):
    """Both int64 extremes in one column: span 2^64 > Long.MAX, and with
    strata=2 the stratum WIDTH itself is 2^63 (one past Long.MAX) — both
    the offset and the width must flow through decimal."""
    values = [-(2**63), -1, 0, 1, 2**63 - 1]
    got = exact_quantiles(
        spark.createDataFrame([(v,) for v in values], "v bigint"),
        "v",
        [0.0, 0.5, 1.0],
        strata=2,
    )
    want = _spark_percentile(spark, values, [0.0, 0.5, 1.0])
    _assert_interp_eq(got, want, values, values=values)


def test_grouped_span_past_long_max_no_ansi_overflow(spark):
    """The grouped form had the same bigint-offset defect (`(_v - _lo)
    div _w` on long columns); its `_w` broadcast column is now
    DECIMAL(38,0) as well."""
    from data_wrangling_spark.operators.quantiles import exact_quantiles_grouped

    df = spark.createDataFrame(
        [("A", -(2**63)), ("A", 0), ("A", 2**63 - 1), ("B", 5)],
        "g string, v bigint",
    )
    got = exact_quantiles_grouped(df, "g", "v", [0.5], strata=2)
    want = {
        r["g"]: float(r["m"])
        for r in df.groupBy("g")
        .agg(F.expr("percentile(v, 0.5)").alias("m"))
        .collect()
    }
    assert {g: vs[0] for g, vs in got.items()} == want


def test_grouped_null_group_keys_excluded(spark):
    """Review regression: a NULL group key used to crash (bounds groupBy
    keeps NULL, but the interval equi-join never matches it). NULL
    groups are now documented as excluded."""
    from data_wrangling_spark.operators.quantiles import exact_quantiles_grouped

    df = spark.createDataFrame(
        [("A", 1), ("A", 9), (None, 2), (None, 8)], "g string, v bigint"
    )
    assert exact_quantiles_grouped(df, "g", "v", [0.5]) == {"A": [5.0]}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_value_lists = st.lists(
    st.one_of(
        # FULL int64 — a draw holding both extremes spans 2^64, past
        # Long.MAX, pinning the decimal-bucketing overflow fix
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.integers(min_value=-50, max_value=50),          # dense dups
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(values=_value_lists, strata=st.sampled_from([2, 7, 64]))
def test_property_matches_spark_percentile(spark, values, strata):
    """Property: for ANY int list (duplicates, negatives, 2^62-scale
    outliers, skewed mass) and any strata width, exact_quantiles ==
    Spark's exact percentile, bit for bit."""
    got = exact_quantiles(
        spark.createDataFrame([(int(v),) for v in values], "v bigint"),
        "v",
        PROBS,
        strata=strata,
    )
    want = _spark_percentile(spark, values, PROBS)
    _assert_interp_eq(got, want, (values, strata), values=values)


def test_interpolation_is_duckdb_exact(spark):
    """The BINDING contract: exact_quantiles must be bit-identical to
    DuckDB's quantile_cont (the driver oracle), including the case
    where it diverges from Spark's percentile — a constant column
    [109, 109] at p=0.1, where lo*(1-f)+hi*f gives 109.00000000000001
    on both DuckDB and this repo while Spark's lo+(hi-lo)*f gives
    109.0 (the round-5 Hypothesis find)."""
    import duckdb

    cases = [
        ([109, 109], [0.1, 0.25, 0.5, 0.75, 0.9]),
        ([3, 1, 4, 1, 5, 9, 2, 6], PROBS),
        ([-7, 13], [0.1, 0.3, 0.7]),
    ]
    con = duckdb.connect()
    for values, probs in cases:
        got = exact_quantiles(
            spark.createDataFrame([(int(v),) for v in values], "v bigint"),
            "v",
            probs,
            strata=16,
        )
        vals_sql = ",".join(f"({v})" for v in values)
        probs_sql = ",".join(str(p) for p in probs)
        want = con.execute(
            f"SELECT quantile_cont(x, [{probs_sql}]) FROM (VALUES {vals_sql}) t(x)"
        ).fetchone()[0]
        assert got == [float(w) for w in want], (values, probs, got, want)
    con.close()
