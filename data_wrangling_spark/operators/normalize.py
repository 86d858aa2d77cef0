"""OP-SHAPE — the reference's shape_element pipeline as DataFrame
transformations (SURVEY.md §2.4, §3 entry point 2).

Reference (Step_2_CSV_and_Data_Cleaning.py:63-186): each <node>/<way>
element becomes rows in 5 relational tables — entity attrs projected by
fixed field list; <tag> children filtered (problem chars), namespace-split
and cleaned by key; <nd> children given dense 0-based positions.

Engine decomposition (all narrow, shuffle-free transformations):
    nodes       filter(element='node')  → select fixed attrs + casts
    ways        filter(element='way')   → select fixed attrs + casts
    nodes_tags  node rows → explode(tags) → problem filter → split → clean
    ways_tags   way  rows → same
    ways_nodes  way  rows → posexplode(nds)

Validation (OP-VALIDATE, S2:232-239 + schema.py:5-65): the cerberus
per-record raise is replaced by schema enforcement (casts) + a quarantine
split: 'permissive' routes violating rows to a side DataFrame, 'strict'
raises with the violation count — the 10×-cost per-row validator becomes
a vectorized null-check predicate (SURVEY.md §1.3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_wrangling_spark.functions.cleaning import (
    clean_tag_value,
    is_problem_key,
    tag_key,
    tag_type,
)

#: fixed attribute projections (S2:56-60) with engine types (SURVEY §1.2)
NODE_FIELDS: dict[str, str] = {
    "id": "long",
    "lat": "double",
    "lon": "double",
    "user": "string",
    "uid": "long",
    "version": "string",
    "changeset": "long",
    "timestamp": "string",
}
WAY_FIELDS: dict[str, str] = {
    "id": "long",
    "user": "string",
    "uid": "long",
    "version": "string",
    "changeset": "long",
    "timestamp": "string",
}
TAG_FIELDS = ("id", "key", "value", "type")
WAY_NODE_FIELDS = ("id", "node_id", "position")


@dataclass
class NormalizedTables:
    """The reference's 5-table star-ish schema plus quarantines."""

    nodes: DataFrame
    nodes_tags: DataFrame
    ways: DataFrame
    ways_nodes: DataFrame
    ways_tags: DataFrame
    quarantine: dict[str, DataFrame]

    def as_dict(self) -> dict[str, DataFrame]:
        return {
            "nodes": self.nodes,
            "nodes_tags": self.nodes_tags,
            "ways": self.ways,
            "ways_nodes": self.ways_nodes,
            "ways_tags": self.ways_tags,
        }


def _entity(raw: DataFrame, element: str, fields: dict[str, str]) -> DataFrame:
    return raw.filter(F.col("element") == element).select(
        *[F.col(name).cast(typ).alias(name) for name, typ in fields.items()]
    )


def _tags(raw: DataFrame, element: str, clean: bool) -> DataFrame:
    """explode(tags) → OP-FLT-PROBLEM → OP-TAG-SPLIT → §2.5 cleaning."""
    exploded = (
        raw.filter(F.col("element") == element)
        .select(F.col("id").cast("long").alias("id"), F.explode("tags").alias("t"))
        .select("id", F.col("t.k").alias("k"), F.col("t.v").alias("v"))
        .filter(~is_problem_key("k"))
    )
    split = exploded.select(
        "id",
        tag_key("k").alias("key"),
        F.col("v").alias("raw_value"),
        tag_type("k").alias("type"),
    )
    value = clean_tag_value("key", F.col("raw_value")) if clean else F.col("raw_value")
    return split.select("id", "key", value.alias("value"), "type")


def _way_nodes(raw: DataFrame) -> DataFrame:
    """OP-POSEXPLODE (S2:171-182): dense 0-based position per parent way —
    posexplode preserves the XML child order exactly."""
    return (
        raw.filter(F.col("element") == "way")
        .select(F.col("id").cast("long").alias("id"), F.posexplode("nds"))
        .select(
            "id",
            F.col("col").cast("long").alias("node_id"),
            F.col("pos").cast("int").alias("position"),
        )
    )


def _required_violation(df: DataFrame, required: tuple[str, ...]) -> Column:
    cond = F.lit(False)
    for c in required:
        cond = cond | F.col(c).isNull()
    return cond


def normalize(
    raw: DataFrame,
    clean: bool = True,
    validate: str = "permissive",
    cache_raw: bool = False,
) -> NormalizedTables:
    """Shape the raw-element DataFrame into the 5 normalized tables.

    validate: 'off' | 'permissive' (quarantine split) | 'strict' (raise on
    first violating table, mirroring the reference's per-record raise at
    S2:232-239 but with one vectorized pass instead of a 10× per-row cost).

    cache_raw: persist the raw-element frame so the 5-table fan-out (and
    the quarantine pass) parses the source ONCE instead of once per
    derived table. Right for XML input that fits cluster memory/disk; at
    100 TB the better shape is a one-time parquet landing zone
    (sources/osm_xml.py::to_landing_zone) — then leave this off and let
    each table read the splittable, column-pruned parquet (SURVEY.md §3
    entry point 2). Caller unpersists via the returned handle.
    """
    if cache_raw:
        raw = raw.persist()
    tables: dict[str, DataFrame] = {
        "nodes": _entity(raw, "node", NODE_FIELDS),
        "nodes_tags": _tags(raw, "node", clean),
        "ways": _entity(raw, "way", WAY_FIELDS),
        "ways_nodes": _way_nodes(raw),
        "ways_tags": _tags(raw, "way", clean),
    }
    required = {
        "nodes": tuple(NODE_FIELDS),
        "nodes_tags": TAG_FIELDS,
        "ways": tuple(WAY_FIELDS),
        "ways_nodes": WAY_NODE_FIELDS,
        "ways_tags": TAG_FIELDS,
    }
    quarantine: dict[str, DataFrame] = {}
    if validate != "off":
        for name, df in tables.items():
            bad = _required_violation(df, required[name])
            quarantine[name] = df.filter(bad)
            tables[name] = df.filter(~bad)
        if validate == "strict":
            for name, q in quarantine.items():
                # one pass, not count()+first() (each recomputes the full
                # upstream lineage incl. the XML parse)
                bad_sample = q.take(1)
                if bad_sample:
                    raise ValueError(
                        f"validation failed: table '{name}' has rows "
                        "violating required-field constraints; first: "
                        f"{bad_sample[0]}"
                    )
    return NormalizedTables(quarantine=quarantine, **tables)
