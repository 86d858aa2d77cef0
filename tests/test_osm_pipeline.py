"""End-to-end OSM pipeline tests (SURVEY.md §5 'golden end-to-end'):
XML fixture → distributed parse → normalize → 5 tables → golden asserts →
the five reference queries (intended form) re-run on the produced tables
against DuckDB."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_wrangling_spark.operators.normalize import normalize
from data_wrangling_spark.sources.osm_xml import read_osm_xml
from data_wrangling_spark.sources.osm_fixture import NODE_TAG_CASES, WAY_CASES, build_osm_xml


@pytest.fixture(scope="module")
def osm_path(tmp_path_factory) -> str:
    p = tmp_path_factory.mktemp("osm") / "fixture.osm"
    p.write_text(build_osm_xml())
    return str(p)


@pytest.fixture(scope="module")
def tables(spark, osm_path):
    raw = read_osm_xml(spark, osm_path)
    out = normalize(raw, clean=True, validate="permissive")
    for name, df in out.as_dict().items():
        df.cache()
    return out


def test_element_dispatch(spark, osm_path):
    raw = read_osm_xml(spark, osm_path)
    counts = {r["element"]: r["n"] for r in raw.groupBy("element").agg(F.count("*").alias("n")).collect()}
    assert counts["node"] == len(NODE_TAG_CASES) + 20
    assert counts["way"] == len(WAY_CASES)
    assert counts["relation"] == 1  # parsed, dropped later by normalize

    nodes_ways_only = read_osm_xml(spark, osm_path, tags=("node", "way"))
    assert nodes_ways_only.filter(F.col("element") == "relation").count() == 0


def test_entity_tables(tables):
    nodes = tables.nodes
    assert dict(nodes.dtypes)["id"] == "bigint"
    assert dict(nodes.dtypes)["lat"] == "double"
    assert nodes.count() == len(NODE_TAG_CASES) + 20
    ways = tables.ways
    assert ways.count() == len(WAY_CASES)
    assert "lat" not in ways.columns


def test_problem_keys_dropped(tables):
    tags = tables.nodes_tags
    assert tags.filter(F.col("key").contains("odd")).count() == 0
    assert tags.filter(F.col("key") == "a.b").count() == 0
    # no relation tags leak in
    assert tables.ways_tags.filter(F.col("key") == "type").count() == 0


def test_tag_split_semantics(tables):
    tags = {r.key: r for r in tables.nodes_tags.collect()}
    # lower-colon: prefix becomes type, remainder key
    assert tags["street"].type == "addr"
    assert tags["feature_id"].type == "gnis"
    # double-colon with non-lowercase tail: ':1' DROPPED (faithful to the
    # reference's re_after_colon backtracking, S2:205)
    assert "name_base" in tags and tags["name_base"].type == "tiger"
    assert not any(k.startswith("name_base:") for k in tags)
    # uppercase prefix fails LOWER_COLON → whole key, type regular
    assert tags["FIXME:de"].type == "regular"
    # plain keys
    assert tags["highway"].type == "regular"
    # way tag: all-lowercase two segments survive entirely
    way_tags = {r.key: r for r in tables.ways_tags.collect()}
    assert way_tags["county"].type == "tiger"


def test_cleaning_applied(tables):
    vals = {
        (r.key, r.value) for r in tables.nodes_tags.collect()
    }
    assert ("street", "Main Street") in vals
    assert ("street", "FM 1100 Road") in vals
    assert ("street", "Basket Flower Bend") in vals  # expected list passthrough
    assert ("street", "Foo Xyzzy") in vals           # unknown suffix passthrough
    assert ("phone", "512-281-5566") in vals
    assert ("postcode", "78621") in vals
    assert ("postcode", "") in vals                  # 'Elgin' → '' (total-fn policy)
    assert ("state", "Texas") in vals
    assert ("city", "Elgin") in vals
    assert ("city", "Round Rock") in vals
    assert ("city", "Cedar-Park") in vals
    assert ("housenumber", "100-102") in vals        # never cleaned
    way_vals = {(r.key, r.value) for r in tables.ways_tags.collect()}
    assert ("street", "Cedar Trail") in way_vals


def test_way_nodes_positions(tables):
    rows = tables.ways_nodes.orderBy("id", "position").collect()
    by_way: dict[int, list] = {}
    for r in rows:
        by_way.setdefault(r.id, []).append(r)
    assert set(by_way) == {w[0] for w in WAY_CASES}
    for way_id, nds, _ in WAY_CASES:
        got = by_way[way_id]
        assert [r.position for r in got] == list(range(len(nds)))  # dense 0-based
        assert [r.node_id for r in got] == nds  # XML child order preserved


def test_validation_permissive_and_strict(spark, tmp_path):
    p = tmp_path / "invalid.osm"
    p.write_text(build_osm_xml(include_invalid=True))
    raw = read_osm_xml(spark, str(p))
    out = normalize(raw, validate="permissive")
    assert out.quarantine["nodes"].count() == 1
    assert out.nodes.filter(F.col("id") == 3000).count() == 0
    with pytest.raises(ValueError, match="validation failed"):
        normalize(raw, validate="strict")


def test_reference_queries_on_produced_tables(spark, tables):
    """Q1-Q5 intended form over the pipeline output, vs DuckDB on the
    exact same rows — the notebook's query stage with a mechanical oracle."""
    con = duckdb.connect()
    pdfs = {name: df.toPandas() for name, df in tables.as_dict().items()}
    for name, pdf in pdfs.items():
        con.register(name, pdf)

    # Q1 intended: union-all of grouped type counts
    q1_spark = (
        tables.ways_tags.groupBy("type").agg(F.count("*").alias("cnt"))
        .unionByName(tables.nodes_tags.groupBy("type").agg(F.count("*").alias("cnt")))
        .orderBy(F.desc("cnt"), "type")
    ).collect()
    q1_duck = con.execute(
        """
        SELECT type, COUNT(*) AS cnt FROM ways_tags GROUP BY type
        UNION ALL
        SELECT type, COUNT(*) AS cnt FROM nodes_tags GROUP BY type
        ORDER BY cnt DESC, type
        """
    ).fetchall()
    assert [(r.type, r.cnt) for r in q1_spark] == q1_duck

    # Q3: join for coordinates of a filtered tag type
    q3_spark = (
        tables.nodes.join(tables.nodes_tags, "id")
        .filter(F.col("type") == "addr")
        .select("id", "lat", "lon", "key")
        .orderBy("id", "key")
    ).collect()
    q3_duck = con.execute(
        """
        SELECT n.id, n.lat, n.lon, t.key FROM nodes n JOIN nodes_tags t USING (id)
        WHERE t.type = 'addr' ORDER BY id, key
        """
    ).fetchall()
    assert [(r.id, r.lat, r.lon, r.key) for r in q3_spark] == q3_duck

    # Q4 intended: top contributors across nodes+ways
    q4_spark = (
        tables.nodes.select("user").unionByName(tables.ways.select("user"))
        .groupBy("user").agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "user").limit(10)
    ).collect()
    q4_duck = con.execute(
        """
        SELECT "user", COUNT(*) AS cnt FROM (
            SELECT "user" FROM nodes UNION ALL SELECT "user" FROM ways
        ) u GROUP BY "user" ORDER BY cnt DESC, "user" LIMIT 10
        """
    ).fetchall()
    assert [(r.user, r.cnt) for r in q4_spark] == q4_duck

    # Q5: oldest/newest timestamps (ISO-8601 string order == time order)
    q5a = tables.nodes.orderBy("timestamp").limit(1).collect()[0].timestamp
    q5b = tables.nodes.orderBy(F.desc("timestamp")).limit(1).collect()[0].timestamp
    a, b = con.execute("SELECT min(timestamp), max(timestamp) FROM nodes").fetchone()
    assert (q5a, q5b) == (a, b)


def test_type_regular_iff_no_lower_colon(tables):
    """Property (SURVEY §5): type='regular' exactly when the ORIGINAL key
    had no lowercase-colon prefix — verified via reconstruction."""
    for r in tables.nodes_tags.collect():
        if r.type == "regular":
            assert ":" not in r.key or not r.key.split(":")[0].islower() or r.key == "FIXME:de"
        else:
            assert r.type and r.type == r.type.lower()
