"""Runtime bloom-filter join pruning — the 100 TB shuffle-join saver.

When a shuffle join's build side carries a selective filter, Spark
(>=3.3) can inject a bloom filter built from the build side's join keys
into the probe side's scan, dropping most probe rows BEFORE the shuffle.
At bench scale the thresholds (10 GB probe-side scan) never trigger, so
this pins the capability with thresholds lowered — proving the engine
configuration exposes it, and that our query shapes (filtered dim joined
to big fact) are eligible."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangling_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
}


@pytest.fixture
def runtime_filter_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_into_probe_side(spark, runtime_filter_confs):
    lineitem = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan, plan
    assert "might_contain" in plan, plan
    # and the result is still correct with the filter active
    naive = (
        lineitem.join(orders.hint("broadcast"), lineitem.l_orderkey == orders.o_orderkey)
        .count()
    )
    assert j.collect()[0].n == naive
