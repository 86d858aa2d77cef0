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


def test_redact_idempotent(spark):
    df = spark.createDataFrame([(t,) for t, _ in CASES], "t string")
    once = df.select(redact_pii("t").alias("r1"))
    twice = once.select(redact_pii("r1").alias("r2"))
    assert [r.r2 for r in twice.collect()] == [
        r.r1 for r in once.collect()
    ]
