"""Source-level malformed-input handling — the ingest-side twin of the
schema-validation quarantine (operators/normalize.py): PERMISSIVE mode
captures bad rows in a corrupt-record column instead of failing the
100 TB job 90% through, DROPMALFORMED filters them, FAILFAST surfaces
them immediately; from_json nulls (quarantines) unparseable payloads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

CSV = "\n".join(
    [
        "id,qty,price",
        "1,3,9.99",
        "2,not_a_number,5.00",   # malformed qty
        "3,7,1.25",
        "garbage line without commas maybe,",
    ]
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("qty", T.IntegerType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


@pytest.fixture
def csv_path(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(CSV)
    return str(p)


def test_permissive_quarantines_bad_rows(spark, csv_path):
    df = (
        spark.read.schema(SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(csv_path)
    ).cache()  # corrupt-record column requires the raw row to be retained
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert bad.count() == 2  # the bad-qty row and the garbage line
    # quarantined rows carry the ORIGINAL text for repair/audit
    assert any("not_a_number" in r._corrupt_record for r in bad.collect())
    df.unpersist()


def test_dropmalformed_keeps_only_clean(spark, csv_path):
    schema = T.StructType(SCHEMA.fields[:-1])
    df = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(csv_path)
    )
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_failfast_raises(spark, csv_path):
    schema = T.StructType(SCHEMA.fields[:-1])
    df = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(csv_path)
    )
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        df.collect()


def test_from_json_quarantines_corrupt_payloads(spark):
    """from_json in PERMISSIVE mode with a corrupt-record column: bad
    JSON keeps its ORIGINAL text in the quarantine column (a bare null
    struct field cannot distinguish '{}' from garbage); null input
    stays a null struct."""
    rows = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "{not json"), (3, None)], "id long, props string"
    )
    parsed = rows.select(
        "id",
        F.from_json(
            "props",
            "k int, _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("p"),
    ).select("id", F.col("p.k").alias("k"), F.col("p._corrupt").alias("corrupt"))
    got = {r.id: (r.k, r.corrupt) for r in parsed.collect()}
    assert got == {1: (5, None), 2: (None, "{not json"), 3: (None, None)}
