"""Cleaning-operator oracle queries (SURVEY.md §2.5, milestone 2).

Each query synthesizes dirty values from the corpus (same modulo pick on
both engines), applies the engine's Column-expression cleaner on the Spark
side, and compares against hand-written GOLDEN literals on the DuckDB side.
This checks the cleaner against the reference's semantics, not against a
re-implementation of the same regexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangling_spark.functions import cleaning
from data_wrangling_spark.plans import corpus as C
from data_wrangling_spark.plans.registry import register
from data_wrangling_spark.sources.tables import load_table


def _make(name: str, corpus: list[tuple[str, str]], clean_fn, cite: str) -> None:
    oracle = f"""
        SELECT c_custkey AS id,
               {C.pick_raw_sql('c_custkey', corpus)} AS raw,
               {C.pick_expected_sql('c_custkey', corpus)} AS cleaned
        FROM customer ORDER BY id
    """

    def spark_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer")
        raw = C.pick_raw(F.col("c_custkey"), corpus)
        return cust.select(
            F.col("c_custkey").alias("id"),
            raw.alias("raw"),
            clean_fn(raw).alias("cleaned"),
        ).orderBy("id")

    spark_fn.__name__ = name
    register(
        name,
        oracle=oracle,
        doc=f"{cite}: engine cleaner vs hand-computed goldens over the "
        "FIXTURES.md dirty corpus, one value per customer row.",
    )(spark_fn)


_make("clean_street", C.STREET_CORPUS, cleaning.clean_street, "OP-FN-STREET (S2:242-247)")
_make("clean_phone", C.PHONE_CORPUS, cleaning.clean_phone, "OP-FN-PHONE (S2:249-257)")
_make("clean_postcode", C.POSTCODE_CORPUS, cleaning.clean_postcode, "OP-FN-POSTCODE (S2:270-273)")
_make("clean_state", C.STATE_CORPUS, cleaning.clean_state, "OP-FN-STATE (S2:276-279)")
_make("clean_city", C.CITY_CORPUS, cleaning.clean_city, "OP-FN-CITY (S2:259-267)")


@register(
    "clean_tag_dispatch",
    oracle=f"""
        SELECT c_custkey AS id,
               CASE c_custkey % 5 WHEN 0 THEN 'street' WHEN 1 THEN 'phone'
                    WHEN 2 THEN 'postcode' WHEN 3 THEN 'state' ELSE 'city' END AS key,
               CASE c_custkey % 5
                    WHEN 0 THEN {C.pick_expected_sql('c_custkey', C.STREET_CORPUS)}
                    WHEN 1 THEN {C.pick_expected_sql('c_custkey', C.PHONE_CORPUS)}
                    WHEN 2 THEN {C.pick_expected_sql('c_custkey', C.POSTCODE_CORPUS)}
                    WHEN 3 THEN {C.pick_expected_sql('c_custkey', C.STATE_CORPUS)}
                    ELSE {C.pick_expected_sql('c_custkey', C.CITY_CORPUS)} END AS value
        FROM customer ORDER BY id
    """,
    doc="Per-key cleaner dispatch (S2:90-113): one when-chain applies the "
        "right cleaner by tag key, mirroring the shape_element dispatch.",
)
def clean_tag_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    key = (
        F.when(k % 5 == 0, "street")
        .when(k % 5 == 1, "phone")
        .when(k % 5 == 2, "postcode")
        .when(k % 5 == 3, "state")
        .otherwise("city")
    )
    raw = (
        F.when(k % 5 == 0, C.pick_raw(k, C.STREET_CORPUS))
        .when(k % 5 == 1, C.pick_raw(k, C.PHONE_CORPUS))
        .when(k % 5 == 2, C.pick_raw(k, C.POSTCODE_CORPUS))
        .when(k % 5 == 3, C.pick_raw(k, C.STATE_CORPUS))
        .otherwise(C.pick_raw(k, C.CITY_CORPUS))
    )
    return cust.select(
        k.alias("id"),
        key.alias("key"),
        cleaning.clean_tag_value(key, raw).alias("value"),
    ).orderBy("id")
