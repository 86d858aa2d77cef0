"""Bucketing (SURVEY.md §4 / task-spec scale checklist: 'bucketing for
co-located joins'): writing both join sides bucketed by the join key lets
the sort-merge join run with NO shuffle exchange — the property asserted
here straight from the physical plan. At 100 TB this converts the
biggest recurring fact-fact join from two full shuffles into zero."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_wrangling_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
           .sortBy("o_orderkey").option("path", str(wh / "b_orders"))
           .saveAsTable("b_orders"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey").option("path", str(wh / "b_lineitem"))
       .saveAsTable("b_lineitem"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(bucketed):
    spark = bucketed
    # disable auto-broadcast so the join strategy is SMJ, where bucketing
    # co-location actually matters (broadcast would hide the exchange)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either side: the only allowed
        # exchange is the post-join aggregation's — and even that one is
        # unnecessary because bucketing preserves o_orderkey partitioning
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan

        # and correctness: equals the plain (shuffled) join
        want = (
            load_table(spark, SF_DIR, "orders")
            .join(load_table(spark, SF_DIR, "lineitem"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey").agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
