"""salted_join: exact equivalence with the plain join on skewed data
(salting must repartition work, never change results)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangling_spark.operators.skew import salted_join


def _skewed(spark):
    # 90% of rows share key 0 (the hot key), the rest spread over 1..9
    left = spark.range(2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return left, right


def _rows(df):
    return sorted((r.row_id, r.k, r.payload, r.name) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    left, right = _skewed(spark)
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", salt_col="row_id", buckets=8)
    assert _rows(salted.select("row_id", "k", "payload", "name")) == _rows(
        plain.select("row_id", "k", "payload", "name")
    )


def test_salted_left_join_keeps_unmatched(spark):
    left, right = _skewed(spark)
    # shrink the dim so some keys have no match
    right = right.filter(F.col("k") < 5)
    plain = left.join(right, "k", "left")
    salted = salted_join(left, right, "k", salt_col="row_id", buckets=8, how="left")
    assert _rows(salted.select("row_id", "k", "payload", "name")) == _rows(
        plain.select("row_id", "k", "payload", "name")
    )


def test_salt_actually_spreads_hot_key(spark):
    left, _ = _skewed(spark)
    salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8))
    )
    n_salts = (
        salted.filter(F.col("k") == 0).select("_salt").distinct().count()
    )
    assert n_salts == 8, "hot key's rows should land in every salt bucket"


def test_default_whole_row_salt_spreads_null_salt_col(spark):
    """xxhash64(NULL) is a constant, so a NULL-heavy salt_col co-buckets
    the hot key (ADVICE r2). The salt_col=None default hashes the whole
    row and must both spread the hot key and keep results exact."""
    left, right = _skewed(spark)
    # a salt column that is NULL on every hot-key row — worst case
    left = left.withColumn(
        "bad_salt", F.when(F.col("k") != 0, F.col("row_id"))
    )
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", buckets=8)  # default: whole-row hash
    assert _rows(salted.select("row_id", "k", "payload", "name")) == _rows(
        plain.select("row_id", "k", "payload", "name")
    )
    spread = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)),
    )
    n_salts = spread.filter(F.col("k") == 0).select("_salt").distinct().count()
    assert n_salts == 8, "whole-row salt should hit every bucket for the hot key"
    # and the documented failure mode is real: salting BY the null column
    # degenerates to one bucket
    degen = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("bad_salt")), F.lit(8))
    )
    assert degen.filter(F.col("k") == 0).select("_salt").distinct().count() == 1


def test_salted_join_rejects_right_outer(spark):
    import pytest

    left, right = _skewed(spark)
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="duplicate unmatched"):
            salted_join(left, right, "k", salt_col="row_id", how=how)


def test_salted_join_left_anti_semi(spark):
    left, right = _skewed(spark)
    right = right.filter(F.col("k") < 5)
    for how in ("left_semi", "left_anti"):
        plain = sorted(r.row_id for r in left.join(right, "k", how).collect())
        salted = sorted(
            r.row_id
            for r in salted_join(left, right, "k", salt_col="row_id", how=how).collect()
        )
        assert salted == plain, how
