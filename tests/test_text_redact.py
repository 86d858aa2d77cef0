"""PII redaction on planted examples: each pattern class, mixed text,
idempotence on already-redacted text, and clean text untouched."""

from __future__ import annotations

from data_wrangling_spark.functions.text import redact_pii


CASES = [
    ("contact alice@example.com today", "contact <EMAIL> today"),
    ("ssn 123-45-6789 on file", "ssn <SSN> on file"),
    ("call (512) 281-5566 now", "call <PHONE> now"),
    ("call 512-281-5566 or 512.281.5566", "call <PHONE> or <PHONE>"),
    ("a@b.co and 987-65-4321 and 800 555 1234", "<EMAIL> and <SSN> and <PHONE>"),
    ("no pii here, just text 12345", "no pii here, just text 12345"),
    ("", ""),
]


def test_redact_planted_pii(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(CASES)], "i long, t string")
    got = {r.i: r.red for r in df.select("i", redact_pii("t").alias("red")).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_redact_guard_equivalence(spark):
    """The contains('@') / rlike('[0-9]{3}') guards are necessary
    conditions of their patterns, so guarded redact == the plain
    three-pass regexp_replace chain on any input — checked on the
    planted cases plus real corpus text."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.functions.text import PII_PATTERNS

    def unguarded(col):
        out = F.col(col)
        for pattern, token in PII_PATTERNS:
            out = F.regexp_replace(out, pattern, token)
        return out

    planted = spark.createDataFrame([(t,) for t, _ in CASES], "t string")
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("text").alias("t")
    )
    for df in (planted, corpus):
        diff = df.select(
            redact_pii("t").alias("g"), unguarded("t").alias("u")
        ).filter(~F.col("g").eqNullSafe(F.col("u")))
        assert diff.count() == 0


def test_redact_idempotent(spark):
    df = spark.createDataFrame([(t,) for t, _ in CASES], "t string")
    once = df.select(redact_pii("t").alias("r1"))
    twice = once.select(redact_pii("r1").alias("r2"))
    assert [r.r2 for r in twice.collect()] == [
        r.r1 for r in once.collect()
    ]
