"""interval_join semantics: keyed and bucketed shapes must agree with the
naive range predicate exactly (bucketing is a cost strategy, never a
semantics change), the interval is half-open, and keyless-unbucketed is
refused (it would plan a cartesian range join)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_wrangling_spark.operators.temporal import interval_join

T0 = dt.datetime(2024, 1, 1)


def _points(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", T0 + dt.timedelta(hours=i)) for i in range(50)]
    return spark.createDataFrame(rows, "pid long, k string, t timestamp")


def _intervals(spark):
    rows = [
        (100, "a", T0 + dt.timedelta(hours=2), T0 + dt.timedelta(hours=10)),
        (101, "a", T0 + dt.timedelta(hours=8), T0 + dt.timedelta(hours=9)),
        (102, "b", T0 + dt.timedelta(hours=5), T0 + dt.timedelta(hours=40)),
        (103, "b", T0 + dt.timedelta(hours=49), T0 + dt.timedelta(hours=120)),
        (104, "a", T0 - dt.timedelta(hours=5), T0),  # fully before all points
    ]
    return spark.createDataFrame(rows, "iid long, k string, s timestamp, e timestamp")


def _naive(points, intervals, keyed: bool):
    cond = (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e"))
    if keyed:
        cond = cond & (F.col("k") == F.col("k2"))
    out = points.join(intervals.withColumnRenamed("k", "k2"), cond)
    return sorted((r.pid, r.iid) for r in out.select("pid", "iid").collect())


def test_keyed_matches_naive(spark):
    p, i = _points(spark), _intervals(spark)
    got = interval_join(p, i, "t", "s", "e", on="k")
    assert sorted((r.pid, r.iid) for r in got.select("pid", "iid").collect()) == _naive(
        p, i, keyed=True
    )


@pytest.mark.parametrize("bucket_seconds", [3600, 7200, 86400, 7 * 86400])
def test_bucketed_matches_naive_any_width(spark, bucket_seconds):
    """Bucket width must not change results — intervals longer AND
    shorter than the bucket, and intervals spanning many buckets, all
    reduce to the same exact predicate."""
    p, i = _points(spark), _intervals(spark)
    got = interval_join(p, i.drop("k"), "t", "s", "e", bucket_seconds=bucket_seconds)
    assert sorted((r.pid, r.iid) for r in got.select("pid", "iid").collect()) == _naive(
        p, i, keyed=False
    )


def test_keyed_plus_bucketed_matches_naive(spark):
    p, i = _points(spark), _intervals(spark)
    got = interval_join(p, i, "t", "s", "e", on="k", bucket_seconds=3600)
    assert sorted((r.pid, r.iid) for r in got.select("pid", "iid").collect()) == _naive(
        p, i, keyed=True
    )


def test_half_open_boundaries(spark):
    p = spark.createDataFrame([(1, T0), (2, T0 + dt.timedelta(hours=1))], "pid long, t timestamp")
    i = spark.createDataFrame([(9, T0, T0 + dt.timedelta(hours=1))], "iid long, s timestamp, e timestamp")
    got = interval_join(p, i, "t", "s", "e", bucket_seconds=60).select("pid").collect()
    assert [r.pid for r in got] == [1]  # start inclusive, end exclusive


def test_refuses_cartesian(spark):
    p, i = _points(spark), _intervals(spark)
    with pytest.raises(ValueError, match="equi key"):
        interval_join(p, i.drop("k"), "t", "s", "e")


def test_refuses_ambiguous_columns(spark):
    p = _points(spark)
    with pytest.raises(ValueError, match="ambiguous"):
        interval_join(p, p.withColumnRenamed("pid", "iid"), "t", "t", "t", on="k")


def test_reserved_bucket_column_refused(spark):
    p, i = _points(spark), _intervals(spark)
    with pytest.raises(ValueError, match="_bucket"):
        interval_join(
            p.withColumnRenamed("pid", "_bucket"), i, "t", "s", "e",
            on="k", bucket_seconds=3600,
        )


def test_bucketed_plan_is_hash_join_not_nested_loop(spark):
    """The point of bucketing: the physical plan must contain a hash join
    on the bucket key, not BroadcastNestedLoopJoin."""
    p, i = _points(spark), _intervals(spark)
    plan = interval_join(
        p, i.drop("k"), "t", "s", "e", bucket_seconds=3600
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
