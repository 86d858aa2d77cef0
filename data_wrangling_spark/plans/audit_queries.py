"""Audit-aggregation oracle query (SURVEY.md §2.6 OP-AGG-AUDIT, milestone 3).

Synthesizes a tag table (key = one of the six audited keys by row modulo,
value = the matching dirty corpus entry) and runs the engine's audit
operator; the oracle re-expresses the audit semantics in ANSI SQL
(regexp bucket + string_agg of distinct values). ``values`` is the
sorted-distinct set joined with '|' so the driver can hash it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangling_spark.functions.cleaning import EXPECTED_STREET_TYPES
from data_wrangling_spark.operators.audit import audit
from data_wrangling_spark.plans import corpus as C
from data_wrangling_spark.plans.registry import register
from data_wrangling_spark.sources.tables import load_table

_KEYS = [
    ("addr:street", "street", C.STREET_CORPUS),
    ("addr:state", "state", C.STATE_CORPUS),
    ("phone", "phone", C.PHONE_CORPUS),
    ("addr:postcode", "postcode", C.POSTCODE_CORPUS),
    ("addr:city", "city", C.CITY_CORPUS),
    ("addr:housenumber", "housenumber", C.HOUSENUMBER_CORPUS),
]

_EXPECTED_IN = ", ".join(f"'{s}'" for s in EXPECTED_STREET_TYPES)

_KEY_CASE = ("CASE c_custkey % 6 "
             + " ".join(f"WHEN {i} THEN '{k}'" for i, (k, _, _) in enumerate(_KEYS))
             + " END")
_VALUE_CASE = ("CASE c_custkey % 6 "
               + " ".join(f"WHEN {i} THEN {C.pick_raw_sql('c_custkey', corp)}"
                          for i, (_, _, corp) in enumerate(_KEYS))
               + " END")

_ORACLE = f"""
    WITH tags AS (
        SELECT {_KEY_CASE} AS key, {_VALUE_CASE} AS value FROM customer
    ), bucketed AS (
        SELECT CASE key
                   WHEN 'addr:street' THEN 'street'
                   WHEN 'addr:state' THEN 'state'
                   WHEN 'phone' THEN 'phone'
                   WHEN 'addr:postcode' THEN 'postcode'
                   WHEN 'addr:city' THEN 'city'
                   WHEN 'addr:housenumber' THEN 'housenumber' END AS field,
               CASE key
                   WHEN 'addr:street' THEN regexp_extract(value, '\\b\\S+\\.?$')
                   WHEN 'addr:state' THEN regexp_extract(value, '[A-Za-z+]+')
                   WHEN 'addr:city' THEN regexp_extract(value, '^[\\w\\-]+')
                   WHEN 'addr:housenumber' THEN regexp_extract(value, '\\d+')
                   ELSE '' END AS bucket,
               value
        FROM tags
    )
    SELECT field, bucket,
           string_agg(DISTINCT value, '|' ORDER BY value) AS values,
           COUNT(DISTINCT value) AS n_values
    FROM bucketed
    WHERE (field IN ('phone', 'postcode') OR bucket <> '')
      AND (field <> 'street' OR bucket NOT IN ({_EXPECTED_IN}))
    GROUP BY field, bucket
    ORDER BY field, bucket
"""


@register(
    "audit_fields",
    oracle=_ORACLE,
    doc="OP-AGG-AUDIT (Step_1_Audit_Values.py:43-125): per-field bucket → "
        "sorted distinct dirty values. One scan, one low-cardinality "
        "shuffle; collect_set bounds state by vocabulary, not row count.",
)
def audit_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    key = F.when(k % 6 == 0, _KEYS[0][0])
    for i, (kk, _, _) in enumerate(_KEYS[1:], 1):
        key = key.when(k % 6 == i, kk)
    value = F.when(k % 6 == 0, C.pick_raw(k, _KEYS[0][2]))
    for i, (_, _, corp) in enumerate(_KEYS[1:], 1):
        value = value.when(k % 6 == i, C.pick_raw(k, corp))
    tags = cust.select(key.alias("key"), value.alias("value"))
    out = audit(tags)
    return out.select(
        "field",
        "bucket",
        F.concat_ws("|", "values").alias("values"),
        "n_values",
    ).orderBy("field", "bucket")
