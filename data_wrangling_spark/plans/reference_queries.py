"""Reference query surface (SURVEY.md §2.6-§2.9, Q1-Q5 + structural ops),
mapped onto the driver's TPC-H-ish tables (TESTDATA.md).

The reference's five analytic queries run over the OSM star schema
(nodes / *_tags / ways_nodes). The driver's oracle runs over the synthetic
relational tables, so each query keeps its SHAPE (union-of-grouped-counts,
equi-join + filter, top-k, min/max-by-sort) but binds to the testdata
tables. The OSM-shaped originals are exercised verbatim in
tests/test_osm_pipeline.py over the FIXTURES.md corpus.

Semantics decisions per SURVEY.md §2.9:
- Q1/Q4 use the *intended* ANSI reading (both arms grouped / union-then-
  group); Q1's literal-SQLite reading is kept as a separate query with
  ``min(type)`` standing in for SQLite's nondeterministic bare column.
- Q3 is an inner equi-join (the reference's comma-join + WHERE typo).
- float aggregates go through exact integer-cents arithmetic so the value
  hash matches DuckDB bit-for-bit (see _cents_sum/_sql docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_wrangling_spark.plans.registry import register
from data_wrangling_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# deterministic float aggregation helpers
#
# SUM over doubles is order-dependent, and Spark's partial aggregation order
# differs from DuckDB's — a raw SUM(double) can differ in the last ulps and
# break the driver's value hash. All money/quantity sums therefore go through
# exact integer arithmetic: round each term to integer cents (bit-identical
# IEEE ops on both engines), SUM the int64s (exact, order-independent), and
# divide once at the end (single IEEE op, bit-identical). Scale-safe: the
# int64 sums overflow only past ~9e18 cents.
# ---------------------------------------------------------------------------

def _cents_sum(col: Column, scale: int = 100) -> Column:
    return F.sum(F.round(col * scale, 0).cast("bigint")) / F.lit(float(scale))


def _cents_sum_sql(expr: str, scale: int = 100) -> str:
    # outer BIGINT cast: DuckDB's SUM(BIGINT) yields HUGEINT (→ float64 in
    # pandas); Spark's yields LongType — align on int64.
    return f"CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS BIGINT) / {float(scale)}"


# ---------------------------------------------------------------------------
# Q1 — union of per-type counts (intended ANSI form; NB:12095-12099)
# ---------------------------------------------------------------------------

@register(
    "q1_type_counts_union",
    oracle="""
        SELECT o_orderstatus AS type, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus
        UNION ALL
        SELECT l_returnflag AS type, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag
        ORDER BY cnt DESC, type
    """,
    doc="Q1 intended form (SURVEY §2.9.1): UNION ALL of two grouped counts; "
        "orders.o_orderstatus / lineitem.l_returnflag stand in for "
        "ways_tags.type / node_tags.type.",
    bench=True,
)
def q1_type_counts_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    arm1 = orders.groupBy(F.col("o_orderstatus").alias("type")).agg(F.count("*").alias("cnt"))
    arm2 = lineitem.groupBy(F.col("l_returnflag").alias("type")).agg(F.count("*").alias("cnt"))
    return arm1.unionByName(arm2).orderBy(F.desc("cnt"), "type")


@register(
    "q1_literal_sqlite",
    oracle="""
        SELECT min(o_orderstatus) AS type, COUNT(*) AS cnt FROM orders
        UNION ALL
        SELECT l_returnflag AS type, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag
        ORDER BY cnt DESC, type
    """,
    doc="Q1 literal-SQLite form (SURVEY §2.9.1): first arm ungrouped — one "
        "total-count row; min() replaces SQLite's nondeterministic bare column.",
)
def q1_literal_sqlite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    arm1 = orders.agg(
        F.min("o_orderstatus").alias("type"), F.count("*").alias("cnt")
    )
    arm2 = lineitem.groupBy(F.col("l_returnflag").alias("type")).agg(F.count("*").alias("cnt"))
    return arm1.unionByName(arm2).orderBy(F.desc("cnt"), "type")


# ---------------------------------------------------------------------------
# Q2 — per-type counts (NB:12229-12232)
# ---------------------------------------------------------------------------

@register(
    "q2_type_counts",
    oracle="""
        SELECT event_type AS type, COUNT(*) AS cnt
        FROM events GROUP BY event_type ORDER BY cnt DESC, type
    """,
    doc="Q2: plain hash aggregate, desc by count (node_tags.type → "
        "events.event_type). Partial+final agg; no raw-row shuffle.",
    bench=True,
)
def q2_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.col("event_type").alias("type"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "type")
    )


# ---------------------------------------------------------------------------
# Q3 — equi-join + selective filter (NB:12357-12360, fire hydrants)
# ---------------------------------------------------------------------------

@register(
    "q3_join_filter",
    oracle="""
        SELECT c.c_custkey AS id, c.c_acctbal AS acctbal,
               c.c_mktsegment AS segment, o.o_orderkey AS orderkey,
               o.o_orderstatus AS type
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE o.o_orderstatus = 'P'
        ORDER BY id, orderkey
    """,
    doc="Q3 shape: inner equi-join with a selective filter on the tag side "
        "(type='fire_hydrant' → o_orderstatus='P'). Filter pushed below the "
        "join; the filtered side broadcasts at small selectivity, AQE decides.",
    bench=True,
)
def q3_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "inner")
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderstatus").alias("type"),
        )
        .orderBy("id", "orderkey")
    )


# ---------------------------------------------------------------------------
# Q4 — top-10 contributors across a union (NB:12447-12452)
# ---------------------------------------------------------------------------

@register(
    "q4_top_users",
    oracle="""
        SELECT user_id, COUNT(*) AS cnt FROM (
            SELECT user_id FROM events
            UNION ALL
            SELECT o_custkey AS user_id FROM orders
        ) u
        GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 10
    """,
    doc="Q4 intended form (SURVEY §2.9.2): union projected user columns, "
        "group, top-10. Catalyst: partial+final hash agg + "
        "TakeOrderedAndProject (no full sort). Deterministic tiebreak on "
        "user_id so the top-10 set is stable across engines.",
    bench=True,
)
def q4_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events").select("user_id")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("user_id"))
    return (
        events.unionByName(orders)
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "user_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 — oldest / newest timestamp via sort+limit (NB:12552-12555, 12607-12610)
# ---------------------------------------------------------------------------

@register(
    "q5a_oldest_ts",
    oracle="SELECT ts FROM events ORDER BY ts LIMIT 1",
    doc="Q5a: min timestamp via ORDER BY + LIMIT 1 — Catalyst emits "
        "TakeOrderedAndProject (per-partition top-1 + driver merge, no "
        "full sort; equivalent to agg(min) at any scale).",
)
def q5a_oldest_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select("ts").orderBy("ts").limit(1)


@register(
    "q5b_newest_ts",
    oracle="SELECT ts FROM events ORDER BY ts DESC LIMIT 1",
    doc="Q5b: max timestamp via ORDER BY DESC + LIMIT 1.",
)
def q5b_newest_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select("ts").orderBy(F.desc("ts")).limit(1)


# ---------------------------------------------------------------------------
# structural operators (SURVEY §2.3-§2.4, §2.8) as standalone oracle queries
# ---------------------------------------------------------------------------

@register(
    "op_project_attrs",
    oracle="""
        SELECT event_id AS id, user_id AS uid, ts AS timestamp
        FROM events ORDER BY id
    """,
    doc="OP-PRJ-ATTR (S2:56-60,74-75): fixed-field projection; reaches the "
        "parquet scan as ReadSchema pruning (only 3 of 6 columns read).",
)
def op_project_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .select(
            F.col("event_id").alias("id"),
            F.col("user_id").alias("uid"),
            F.col("ts").alias("timestamp"),
        )
        .orderBy("id")
    )


@register(
    "op_posexplode_positions",
    oracle="""
        SELECT l_orderkey AS id, l_partkey AS node_id,
               ROW_NUMBER() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice
               ) - 1 AS position
        FROM lineitem ORDER BY id, position
    """,
    doc="OP-POSEXPLODE (S2:171-182): dense 0-based per-parent position, the "
        "ways_nodes ordered-bridge semantics, over lineitem's per-order lines. "
        "The window ORDER BY carries a full tiebreak — (l_orderkey, "
        "l_linenumber) alone is NOT unique in the testdata, and ties would "
        "make row_number engine-dependent.",
)
def op_posexplode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("id"),
            F.col("l_partkey").alias("node_id"),
            (F.row_number().over(w) - 1).cast("int").alias("position"),
        )
        .orderBy("id", "position")
    )


# synthesized tag corpus: region×nation names give keys with a lowercase
# colon split ('africa:nation_0'), keys that fail LOWER_COLON via a space
# ('middle east:nation_5' → regular), all deterministic on both engines.
_TAG_KEYS_SQL = """
    SELECT n.n_nationkey AS id,
           concat(lower(r.r_name), ':', lower(n.n_name)) AS k,
           n.n_name AS v
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@register(
    "op_tag_split",
    oracle=f"""
        WITH tags AS ({_TAG_KEYS_SQL})
        SELECT id, k,
               CASE WHEN regexp_matches(k, '^([a-z]|_)+:([a-z]|_)+')
                    THEN regexp_extract(k, '^([a-z_]+):', 1)
                    ELSE 'regular' END AS type,
               CASE WHEN NOT regexp_matches(k, '^([a-z]|_)+:([a-z]|_)+') THEN k
                    WHEN regexp_extract(k, '^[a-z_]+:([a-z_]+:[a-z_]+)', 1) <> ''
                    THEN regexp_extract(k, '^[a-z_]+:([a-z_]+:[a-z_]+)', 1)
                    ELSE regexp_extract(k, '^[a-z_]+:([a-z_]+)', 1) END AS key,
               v AS value
        FROM tags ORDER BY id, k
    """,
    doc="OP-TAG-SPLIT (S2:20,201-230): namespace split on the first colon "
        "with the reference's exact backtracking semantics; keys synthesized "
        "from region:nation names ('middle east:*' fails the gate → regular).",
)
def op_tag_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.functions.cleaning import tag_key, tag_type

    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    tags = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").alias("id"),
        F.concat(F.lower("r_name"), F.lit(":"), F.lower("n_name")).alias("k"),
        F.col("n_name").alias("v"),
    )
    return tags.select(
        "id",
        "k",
        tag_type("k").alias("type"),
        tag_key("k").alias("key"),
        F.col("v").alias("value"),
    ).orderBy("id", "k")


@register(
    "op_problem_filter",
    oracle=r"""
        WITH tags AS (
            SELECT p_partkey AS id, lower(replace(p_brand, '#', '_')) AS k FROM part
            UNION ALL
            SELECT p_partkey AS id, lower(p_name) AS k FROM part
        )
        SELECT id, k FROM tags
        WHERE NOT regexp_matches(k, '[=+/&<>;''"?%#$@,. \t\r\n]')
        ORDER BY id, k
    """,
    doc="OP-FLT-PROBLEM (S2:21,80-81): drop keys containing problem chars; "
        "p_name values contain spaces → dropped, rewritten p_brand survives.",
)
def op_problem_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.functions.cleaning import is_problem_key

    part = _t(spark, sf_dir, "part")
    tags = part.select(
        F.col("p_partkey").alias("id"),
        F.lower(F.regexp_replace("p_brand", "#", "_")).alias("k"),
    ).unionByName(
        part.select(F.col("p_partkey").alias("id"), F.lower("p_name").alias("k"))
    )
    return tags.filter(~is_problem_key("k")).orderBy("id", "k")


@register(
    "op_union_distinct",
    oracle="""
        SELECT user_id FROM events
        UNION
        SELECT o_custkey AS user_id FROM orders
        ORDER BY user_id
    """,
    doc="OP-UNION-DISTINCT (Q4's UNION, NB:12448): union + dedup.",
)
def op_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events").select("user_id")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("user_id"))
    return events.unionByName(orders).distinct().orderBy("user_id")


@register(
    "ext_intersect",
    oracle="""
        SELECT c_custkey AS user_id FROM customer
        INTERSECT
        SELECT user_id FROM events
        ORDER BY user_id
    """,
    doc="Set-op extension (SURVEY §2.8): INTERSECT — free via Spark.",
)
def ext_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("user_id"))
    events = _t(spark, sf_dir, "events").select("user_id")
    return customer.intersect(events).orderBy("user_id")


@register(
    "ext_except",
    oracle="""
        SELECT c_custkey AS user_id FROM customer
        EXCEPT
        SELECT o_custkey AS user_id FROM orders WHERE o_orderstatus = 'F'
        ORDER BY user_id
    """,
    doc="Set-op extension (SURVEY §2.8): EXCEPT (customers with no "
        "finished order). The status slice keeps the result non-empty at "
        "every scale factor (5/71/511 rows at sf0.001/0.01/0.1) — the "
        "unfiltered form returned 0 rows at small SFs, a zero-information "
        "green (round-2 verdict defect #1).",
)
def ext_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("user_id"))
    finished = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("user_id"))
    )
    # subtract IS EXCEPT DISTINCT for any input multiplicity —
    # exceptAll(distinct()).distinct() only matched it while c_custkey
    # happened to be unique
    return customer.subtract(finished).orderBy("user_id")


# ---------------------------------------------------------------------------
# flagship aggregate (bench headline): TPC-H-Q1-shaped pricing summary with
# exact integer-cents arithmetic (see helper docs above)
# ---------------------------------------------------------------------------

@register(
    "ext_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               {_cents_sum_sql('l_extendedprice')} AS sum_base_price,
               {_cents_sum_sql('l_extendedprice * (1 - l_discount)', 10000)} AS sum_disc_price,
               {_cents_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 1000000)} AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary (extension; the engine's heavy-agg "
        "headline). Narrow filter → partial+final hash agg on 2 low-card "
        "keys; sums in exact int64 cents so Spark and DuckDB hash-match.",
    bench=True,
)
def ext_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            _cents_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _cents_sum(disc, 10000).alias("sum_disc_price"),
            _cents_sum(charge, 1000000).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
