"""merge_upsert semantics (update + insert + passthrough), schema guard,
and the partitioned-table write twin: dynamic partition overwrite only
rewrites partitions that received updates."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_wrangling_spark.operators.merge import merge_upsert


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, seg string, bal double")


def test_update_insert_passthrough(spark):
    target = _df(spark, [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0)])
    updates = _df(spark, [(2, "PROMO", 21.0), (9, "NEW", 90.0)])
    got = {r.id: (r.seg, r.bal) for r in merge_upsert(target, updates, "id").collect()}
    assert got == {
        1: ("A", 10.0),      # passthrough
        2: ("PROMO", 21.0),  # updated
        3: ("C", 30.0),      # passthrough
        9: ("NEW", 90.0),    # inserted
    }


def test_composite_key(spark):
    target = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "id long, sub string, v double"
    )
    updates = spark.createDataFrame([(1, "y", 99.0)], "id long, sub string, v double")
    got = {(r.id, r.sub): r.v for r in merge_upsert(target, updates, ["id", "sub"]).collect()}
    assert got == {(1, "x"): 1.0, (1, "y"): 99.0}


def test_schema_mismatch_raises(spark):
    target = _df(spark, [(1, "A", 10.0)])
    updates = target.withColumnRenamed("bal", "balance")
    with pytest.raises(ValueError, match="column sets differ"):
        merge_upsert(target, updates, "id")


def test_dynamic_partition_overwrite_touches_only_updated_partitions(spark, tmp_path):
    """The 100 TB write path: partition the target by a key prefix, merge
    within only the partitions present in the update batch, write with
    partitionOverwriteMode=dynamic — untouched partition files must
    remain byte-identical (not rewritten)."""
    path = str(tmp_path / "tbl")
    target = _df(spark, [(1, "A", 10.0), (2, "B", 20.0), (11, "K", 1.0), (12, "L", 2.0)])
    target.withColumn("pk", F.col("id") % 10).write.partitionBy("pk").parquet(path)

    def mtimes(part):
        d = os.path.join(path, f"pk={part}")
        return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d) if f.endswith(".parquet")}

    before_p1, before_p2 = mtimes(1), mtimes(2)

    updates = _df(spark, [(2, "PROMO", 21.0)]).withColumn("pk", F.col("id") % 10)
    stored = spark.read.parquet(path)
    touched = stored.join(updates.select("pk").distinct(), "pk", "left_semi")
    merged = merge_upsert(touched, updates, "id")
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pk")
        .parquet(path)
    )

    after = {r.id: r.seg for r in spark.read.parquet(path).collect()}
    assert after == {1: "A", 2: "PROMO", 11: "K", 12: "L"}
    assert mtimes(1) == before_p1, "partition pk=1 was rewritten needlessly"
    assert mtimes(2) != before_p2, "partition pk=2 should have been rewritten"
