"""OP-SRC-XML — distributed OSM-XML scan (SURVEY.md §2.1).

Reference: ``get_element`` streams one file with cElementTree.iterparse,
yielding node/way/relation elements on their end events and clearing the
consumed subtree to bound memory (Step_2_CSV_and_Data_Cleaning.py:191-199;
start-event audit variant Step_1_Audit_Values.py:55).

Engine: a pure-PySpark source (no spark-xml dependency): files are listed
driver-side, parallelized BY FILE to executors, and each file is parsed
incrementally with ``iterparse`` inside ``mapPartitions`` — the same
bounded-memory property as the reference (elem.clear() after yield), but
N files parse in parallel.

Scale posture (SURVEY.md §7 hard-point 2): XML is not splittable without
risking elements spanning split boundaries, so parallelism is per file —
correct for OSM, whose extracts shard naturally by region (planet dumps
distribute as many regional .osm files). For a single huge file the right
move at 100 TB is a ONE-TIME conversion to a partitioned parquet landing
zone (``to_landing_zone``); every downstream pass then gets column
pruning, predicate pushdown, and split-level parallelism for free.

Yielded schema (one row per element, FIXTURES.md §2 `raw_elements`):
    element   string  'node' | 'way' | 'relation'
    id, uid, changeset   long
    lat, lon  double (null for ways/relations)
    user, version, timestamp   string
    tags      array<struct<k string, v string>>
    nds       array<long>   (ordered <nd ref> ids; empty for nodes)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RAW_ELEMENT_SCHEMA = T.StructType(
    [
        T.StructField("element", T.StringType(), False),
        T.StructField("id", T.LongType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("uid", T.LongType(), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("changeset", T.LongType(), True),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField(
            "tags",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("k", T.StringType(), True),
                        T.StructField("v", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("nds", T.ArrayType(T.LongType()), True),
    ]
)

_KEPT_TAGS = ("node", "way", "relation")


def _parse_file(path: str, tags: tuple[str, ...]) -> Iterator[tuple]:
    """Incremental single-file parse: constant memory via elem.clear()
    after each yielded element (the engine's root.clear() equivalent)."""

    def opt_long(v: str | None) -> int | None:
        return int(v) if v is not None else None

    def opt_double(v: str | None) -> float | None:
        return float(v) if v is not None else None

    # capture the root so it can be cleared per yielded element:
    # elem.clear() alone empties each element but the root keeps
    # appending child references, growing memory linearly with file size
    # (the reference's root.clear() at S2:199 exists for exactly this)
    context = ET.iterparse(path, events=("start", "end"))
    try:
        _, root = next(context)
    except StopIteration:
        return
    for event, elem in context:
        if event != "end" or elem.tag not in tags:
            continue
        a = elem.attrib
        tag_children = [
            (c.attrib.get("k"), c.attrib.get("v")) for c in elem if c.tag == "tag"
        ]
        nd_children = [
            int(c.attrib["ref"]) for c in elem if c.tag == "nd" and "ref" in c.attrib
        ]
        yield (
            elem.tag,
            opt_long(a.get("id")),
            opt_double(a.get("lat")),
            opt_double(a.get("lon")),
            a.get("user"),
            opt_long(a.get("uid")),
            a.get("version"),
            opt_long(a.get("changeset")),
            a.get("timestamp"),
            tag_children,
            nd_children,
        )
        root.clear()


def read_osm_xml(
    spark: SparkSession,
    paths: str | list[str],
    tags: tuple[str, ...] = _KEPT_TAGS,
) -> DataFrame:
    """Distributed OSM-XML read: one task per file, iterparse inside.

    ``tags`` filters element kinds at the parser (OP-FLT-TAGKIND — the
    reference's ``tags=('node','way')`` call, S2:320, excludes relations
    before any shaping)."""
    import glob as _glob
    import os

    if isinstance(paths, str):
        paths = sorted(_glob.glob(paths)) if any(c in paths for c in "*?[") else [paths]
    paths = [os.path.abspath(p) for p in paths]
    if not paths:
        raise FileNotFoundError("no OSM files matched")

    sc = spark.sparkContext
    files_rdd = sc.parallelize(paths, numSlices=len(paths))
    rows = files_rdd.flatMap(lambda p: _parse_file(p, tags))
    return spark.createDataFrame(rows, RAW_ELEMENT_SCHEMA)


def to_landing_zone(
    spark: SparkSession,
    xml_paths: str | list[str],
    out_dir: str,
    partition_by: str = "element",
) -> None:
    """One-time XML → partitioned-parquet conversion. Downstream passes
    read the landing zone (splittable, column-pruned, predicate-pushed)
    instead of re-parsing XML — the 100 TB ingest pattern."""
    raw = read_osm_xml(spark, xml_paths)
    raw.write.mode("overwrite").partitionBy(partition_by).parquet(out_dir)
