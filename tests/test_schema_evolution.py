"""Schema evolution on the parquet landing zone: an appended batch adds
a column; mergeSchema reads reconcile old and new files (missing values
null), and column pruning still reaches the scan."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_read(spark, tmp_path):
    path = str(tmp_path / "zone")
    v1 = spark.range(5).select(F.col("id"), F.lit("v1").alias("source"))
    v1.write.parquet(path)
    # later batch gains a quality-score column
    v2 = spark.range(5, 8).select(
        F.col("id"), F.lit("v2").alias("source"), (F.col("id") * 0.1).alias("score")
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "source", "score"}
    rows = {r.id: (r.source, r.score) for r in merged.collect()}
    assert rows[0] == ("v1", None)  # old files: new column is null
    assert rows[7] == ("v2", 0.7000000000000001)
    assert len(rows) == 8

    # without mergeSchema the read still works on the common prefix
    plain = spark.read.parquet(path)
    assert "id" in plain.columns and plain.count() == 8


def test_pruning_survives_merged_schema(spark, tmp_path):
    path = str(tmp_path / "zone")
    spark.range(10).select("id", F.lit("x").alias("a")).write.parquet(path)
    spark.range(10, 20).select(
        "id", F.lit("y").alias("a"), F.lit(1).alias("b")
    ).write.mode("append").parquet(path)
    q = spark.read.option("mergeSchema", "true").parquet(path).select("id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<id:bigint>" in plan, plan
