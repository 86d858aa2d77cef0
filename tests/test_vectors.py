"""int8 quantization semantics: round-trip error bounded by scale/2 per
element, range clamped to [-127, 127], zero vectors quarantined as NULL
scale rather than a divide-by-zero crash."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangling_spark.functions.vectors import quantize_int8, quantize_scale


def test_roundtrip_error_within_half_scale(spark):
    df = spark.createDataFrame(
        [(1, [0.91, -0.42, 0.003, -1.27]), (2, [10.0, -5.0, 2.5, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = df.select(
        "embedding",
        quantize_scale("embedding").alias("s"),
        quantize_int8("embedding").alias("q"),
    ).collect()
    for r in rows:
        assert all(-127 <= qi <= 127 for qi in r.q)
        for x, qi in zip(r.embedding, r.q):
            assert abs(qi * r.s - x) <= r.s / 2 + 1e-12


def test_zero_vector_null_scale_not_crash(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, embedding array<double>")
    r = df.select(
        quantize_scale("embedding").alias("s"), quantize_int8("embedding").alias("q")
    ).collect()[0]
    assert r.s is None
    assert list(r.q) == [None, None]


def test_extremes_hit_127(spark):
    df = spark.createDataFrame([(1, [2.0, -2.0, 1.0])], "vec_id long, embedding array<double>")
    r = df.select(quantize_int8("embedding").alias("q")).collect()[0]
    assert list(r.q) == [127, -127, 64]  # 1.0/(2/127) = 63.5 -> HALF_UP 64
