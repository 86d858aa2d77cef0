"""OSM ingest/normalize pipeline exposed to the driver (SURVEY.md §2.1,
§2.4 — OP-SRC-XML + OP-SHAPE end to end).

The driver's testdata has no OSM XML, so the query materializes the
deterministic fixture (sources/osm_fixture.py corpus) into a temp file at
call time, runs the distributed parse + full normalization, and returns
the cleaned nodes_tags table. Hash-checked against the independent
golden parquet (plans/osm_oracle.py); semantic/property assertions live
in tests/test_osm_pipeline.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangling_spark.plans.registry import register


#: memoized fixture paths — repeated driver/test invocations reuse one
#: temp file per variant instead of leaking a mkdtemp per call
_FIXTURE_CACHE: dict[bool, str] = {}


def _fixture_path(include_invalid: bool = False) -> str:
    from data_wrangling_spark.sources.osm_fixture import build_osm_xml

    cached = _FIXTURE_CACHE.get(include_invalid)
    if cached is not None and os.path.exists(cached):
        return cached
    stage = tempfile.mkdtemp(prefix="dws-osm-")
    path = f"{stage}/fixture.osm"
    with open(path, "w") as f:
        f.write(build_osm_xml(include_invalid=include_invalid))
    _FIXTURE_CACHE[include_invalid] = path
    return path


from data_wrangling_spark.plans.osm_oracle import oracle_parquet


@register(
    "osm_pipeline_node_tags",
    # the ingest source is XML, not one of the oracle's views — so the
    # oracle reads the INDEPENDENT golden (plans/osm_oracle.py: a second
    # pure-Python implementation of the split/clean spec over the same
    # fixture corpus), materialized to parquet at registration time
    oracle=f"""
        SELECT id, key, value, type
        FROM read_parquet('{oracle_parquet("node_tags")}')
        ORDER BY id, key
    """,
    doc="OP-SRC-XML → OP-SHAPE end to end: distributed iterparse of OSM "
        "XML, problem-char filter, namespace split, per-key cleaning, "
        "validation split; returns the cleaned nodes_tags table. "
        "Hash-checked against the independent dual-implementation golden "
        "in plans/osm_oracle.py (round-3 verdict gap 1).",
)
def osm_pipeline_node_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.normalize import normalize
    from data_wrangling_spark.sources.osm_xml import read_osm_xml

    raw = read_osm_xml(spark, _fixture_path())
    out = normalize(raw, clean=True, validate="permissive")
    return out.nodes_tags.orderBy("id", "key")


@register(
    "osm_pipeline_audit",
    # independent dual implementation of the audit bucketing over the
    # fixture's raw tag corpus (plans/osm_oracle.py expected_audit_rows)
    oracle=f"""
        SELECT field, bucket, "values", n_values
        FROM read_parquet('{oracle_parquet("audit")}')
        ORDER BY field, bucket
    """,
    doc="OP-AGG-AUDIT over real OSM-shaped input: audit the raw (uncleaned) "
        "tag values, returning (field, bucket, values, n_values) — the "
        "reference's Step-1 workflow as one declarative job. Hash-checked "
        "against the dual-implementation golden in plans/osm_oracle.py.",
)
def osm_pipeline_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.audit import audit
    from data_wrangling_spark.sources.osm_xml import read_osm_xml

    raw = read_osm_xml(spark, _fixture_path(), tags=("node", "way"))
    tags = raw.select(F.explode("tags").alias("t")).select(
        F.col("t.k").alias("key"), F.col("t.v").alias("value")
    )
    out = audit(tags)
    return out.select(
        "field", "bucket", F.concat_ws("|", "values").alias("values"), "n_values"
    ).orderBy("field", "bucket")


@register(
    "x_stream_osm_ingest",
    # golden = parser-free construction of what the fixture XML contains
    # (plans/osm_oracle.py expected_stream_rows, from the same fixture
    # constants build_osm_xml renders); batch==stream parity additionally
    # pinned in tests/test_streaming_osm.py
    oracle=f"""
        SELECT element, id, lat, lon, "user", uid, version, changeset,
               "timestamp", tags_json, nds_json
        FROM read_parquet('{oracle_parquet("stream_rows")}')
        ORDER BY element, id
    """,
    doc="Streaming OSM ingest (SURVEY §2.10 extension): readStream "
        "wholetext over a landing directory, mapInPandas iterparse, "
        "AvailableNow drain. Returns the raw element rows — identical "
        "to the batch reader over the same files. The registered "
        "projection serializes the nested tags/nds arrays to JSON "
        "because the driver's value-hash canonicalizer cannot hash raw "
        "arrays; batch==stream parity over the typed rows is pinned in "
        "tests/test_streaming_osm.py.",
)
def x_stream_osm_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.streaming.osm import drain_osm_stream

    # the memoized fixture lives in its own directory — reuse it as the
    # landing dir instead of staging a fresh copy per call
    landing = os.path.dirname(_fixture_path())
    out = drain_osm_stream(spark, landing, table_name="q_osm_stream")
    nested = {"tags", "nds"}
    cols = [
        F.to_json(c).alias(f"{c}_json") if c in nested else F.col(c)
        for c in out.columns
    ]
    return out.select(*cols).orderBy("element", "id")


@register(
    "osm_pipeline_quarantine",
    # structural facts of the include_invalid fixture, derived from the
    # generator constants (plans/osm_oracle.py expected_quarantine_rows);
    # also pinned in tests/test_osm_pipeline.py
    oracle=f"""
        SELECT "table", n_quarantined, n_clean
        FROM read_parquet('{oracle_parquet("quarantine")}')
        ORDER BY "table"
    """,
    doc="OP-VALIDATE observability: run normalization in permissive mode "
        "over a fixture containing invalid elements and return per-table "
        "(table, n_quarantined, n_clean) — the engine's replacement for "
        "the reference's raise-on-first-error (S2:232-239), keeping bad "
        "rows visible instead of killing a 100 TB job at row one.",
)
def osm_pipeline_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.normalize import normalize
    from data_wrangling_spark.sources.osm_xml import read_osm_xml

    raw = read_osm_xml(spark, _fixture_path(include_invalid=True)).persist()
    try:
        # persist: the 10 per-table counts below otherwise re-run the
        # full XML parse each (5 tables x quarantined/clean)
        out = normalize(raw, clean=True, validate="permissive")
        rows = [
            (name, out.quarantine[name].count(), out.as_dict()[name].count())
            for name in sorted(out.quarantine)
        ]
    finally:
        raw.unpersist()
    return spark.createDataFrame(
        rows, "table string, n_quarantined long, n_clean long"
    ).orderBy("table")
