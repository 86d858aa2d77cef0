"""Dirty-value corpora (FIXTURES.md §3) + dual Spark/SQL generators.

The driver's testdata has no OSM-style dirty strings, so the cleaning /
audit oracle queries synthesize them deterministically: row key modulo
corpus size picks a corpus entry, identically in the Spark plan and in the
DuckDB oracle SQL. Expected outputs are hand-written literals from the
reference's semantics — the oracle therefore checks the engine's cleaning
logic against golden values on every row, not against a re-implementation.

No apostrophes in corpus strings (kept SQL-literal-safe by construction).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (raw, expected_after_clean) — semantics cites are into
# /root/reference/Step_2_CSV_and_Data_Cleaning.py
STREET_CORPUS: list[tuple[str, str]] = [
    ("Main St", "Main Street"),
    ("Main St.", "Main Street"),
    ("FM 1100 Rd", "FM 1100 Road"),
    ("Old Austin Hwy 20 street", "Old Austin Hwy 20 Street"),
    ("Cedar Trl", "Cedar Trail"),
    ("Oak Ln", "Oak Lane"),
    ("Elm Dr", "Elm Drive"),
    ("Fox Cv", "Fox Cove"),
    ("Fox Cc", "Fox Cove"),
    ("Bell Ct", "Bell Court"),
    ("Eagle pass", "Eagle Pass"),
    ("Sunset Terrance", "Sunset Terrace"),
    ("North Ave", "North Avenue"),
    ("Lake View Blvd", "Lake View Boulevard"),
    ("Canyon Rd.", "Canyon Road"),
    ("Basket Flower Bend", "Basket Flower Bend"),   # suffix in expected list
    ("Highway 290", "Highway 290"),                 # numeric suffix expected
    ("Foo Xyzzy", "Foo Xyzzy"),  # unknown suffix: ref raises KeyError (S2:246); engine passes through
]

PHONE_CORPUS: list[tuple[str, str]] = [
    ("(512) 281-5566", "512-281-5566"),
    ("+1 512 281 5566", "512-281-5566"),
    ("1-512-281-5566", "512-281-5566"),
    ("512.281.5566", "512-281-5566"),
    ("5122815566", "512-281-5566"),
    ("512-281-5566", "512-281-5566"),
    ("+1 (512) 555-0199 ext 12", "512-555-019912"),  # everything non-digit stripped
    ("12", "2--"),  # short input: exact slicing parity with the reference (S2:255)
]

POSTCODE_CORPUS: list[tuple[str, str]] = [
    ("78621", "78621"),
    ("78621-1234", "78621"),
    ("TX 78621", "78621"),
    ("78653", "78653"),
    ("Elgin", ""),  # no 5-digit run: ref raises AttributeError (S2:272); engine yields ''
]

STATE_CORPUS: list[tuple[str, str]] = [
    ("TX", "Texas"),
    ("Texas", "Texas"),
    ("tx", "tx"),   # only exact TX maps (S2:276-279)
    ("Tx", "Tx"),
    ("AZ", "AZ"),
]

CITY_CORPUS: list[tuple[str, str]] = [
    ("Elgin", "Elgin"),
    ("Elgin, TX", "Elgin"),
    ("Pflugerville, TX", "Pflugerville"),
    ("Round Rock", "Round Rock"),  # via the hardcoded Round fixup (S2:265-266)
    ("Cedar-Park", "Cedar-Park"),  # hyphen is a word char in ^([\w\-]+)
    ("Austin", "Austin"),
    (" Leander", " Leander"),  # leading space: regex misses → pass-through (S2:262)
]

HOUSENUMBER_CORPUS: list[tuple[str, str]] = [
    ("101", "101"),
    ("2204", "2204"),
    ("100-102", "100-102"),
    ("101B", "101B"),
]  # audited only, never cleaned (NB Step-2 narrative; SURVEY §2.5)


def pick_raw(key: Column, corpus: list[tuple[str, str]]) -> Column:
    """Spark: corpus[key % n].raw via array-literal indexing.

    element_at on a literal array generates O(1) code per row; the
    equivalent when-chain made whole-stage codegen methods exceed janino's
    64 KB limit in queries stacking several corpora (audit_fields), which
    silently dropped the stage to interpreted mode."""
    n = len(corpus)
    arr = F.array(*[F.lit(raw) for raw, _ in corpus])
    return F.element_at(arr, (key % n + 1).cast("int"))


def pick_raw_sql(key_expr: str, corpus: list[tuple[str, str]]) -> str:
    """SQL: the same corpus[key % n].raw as a CASE expression."""
    n = len(corpus)
    whens = " ".join(
        f"WHEN ({key_expr}) % {n} = {i} THEN '{raw}'"
        for i, (raw, _) in enumerate(corpus)
    )
    return f"CASE {whens} END"


def pick_expected_sql(key_expr: str, corpus: list[tuple[str, str]]) -> str:
    """SQL: hand-computed golden output for corpus[key % n]."""
    n = len(corpus)
    whens = " ".join(
        f"WHEN ({key_expr}) % {n} = {i} THEN '{exp}'"
        for i, (_, exp) in enumerate(corpus)
    )
    return f"CASE {whens} END"
