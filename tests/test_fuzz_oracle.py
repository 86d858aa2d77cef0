"""Cross-engine differential SQL fuzzer (round-7 verdict item 8).

The registry's 151 hand-written query/oracle pairs verify specific
shapes; this suite generates SEEDED random ANSI-SQL queries — filters,
group keys, aggregates, joins — and runs each on BOTH engines (Spark
SQL front-end over the same parquet views, DuckDB as the oracle),
comparing the driver's canonical form. The grammar stays inside the
engines' shared-semantics subset the registry already relies on:

- integer/count aggregates only (SUM wrapped CAST(... AS BIGINT) —
  DuckDB SUM(BIGINT) returns HUGEINT); doubles enter only through the
  int-cents ROUND(x * 100) discipline;
- MIN/MAX on ints, strings, timestamps (canonicalized via isoformat);
- no LIMIT (canonical compare is order-insensitive; a LIMIT without a
  total order would be legitimately nondeterministic on both sides);
- predicates on integer ranges and low-cardinality string IN-lists.

Seeded with a fixed constant: every run generates the identical 120
queries, so a failure is reproducible by seed index.
"""

from __future__ import annotations

import random

import pytest

from data_wrangling_spark.sources.tables import load_table
from tests.conftest import SF_DIR, canonical

N_QUERIES = 120
SEED = 0x5EED

#: (table, categorical cols, integer cols, cents cols, ts col, join)
TABLES = {
    "orders": {
        "cat": ["o_orderstatus", "o_orderpriority"],
        "int": ["o_orderkey", "o_custkey"],
        "cents": ["o_totalprice"],
        "ts": "o_orderdate",
    },
    "lineitem": {
        "cat": ["l_returnflag", "l_linestatus"],
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "cents": ["l_extendedprice", "l_discount"],
        "ts": "l_shipdate",
    },
    "customer": {
        "cat": ["c_mktsegment", "c_nationkey"],
        "int": ["c_custkey", "c_nationkey"],
        "cents": ["c_acctbal"],
        "ts": None,
    },
    "events": {
        "cat": ["event_type"],
        "int": ["event_id", "user_id"],
        "cents": ["value"],
        "ts": "ts",
    },
}

JOINS = [
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("events", "customer", "user_id", "c_custkey"),
]

#: category values present at every scale (driver data is deterministic)
CAT_VALUES = {
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                        "5-LOW"],
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
    "c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                     "MACHINERY"],
    "c_nationkey": list(range(25)),
    "event_type": ["click", "view", "purchase", "signup", "error"],
}


def _gen_query(rng: random.Random) -> str:
    if rng.random() < 0.3:
        lt, rt, lk, rk = rng.choice(JOINS)
        frm = f"{lt} JOIN {rt} ON {lt}.{lk} = {rt}.{rk}"
        spec = {
            "cat": TABLES[lt]["cat"] + TABLES[rt]["cat"],
            "int": TABLES[lt]["int"] + TABLES[rt]["int"],
            "cents": TABLES[lt]["cents"] + TABLES[rt]["cents"],
        }
    else:
        t = rng.choice(list(TABLES))
        frm = t
        spec = TABLES[t]

    group = rng.sample(spec["cat"], k=rng.randint(0, min(2, len(spec["cat"]))))

    aggs = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(["count", "sum_int", "sum_cents", "min", "max",
                           "count_distinct"])
        i = len(aggs)
        if kind == "count":
            aggs.append(f"COUNT(*) AS agg_{i}")
        elif kind == "sum_int":
            c = rng.choice(spec["int"])
            aggs.append(f"CAST(SUM({c}) AS BIGINT) AS agg_{i}")
        elif kind == "sum_cents":
            c = rng.choice(spec["cents"])
            aggs.append(
                f"CAST(SUM(CAST(ROUND({c} * 100, 0) AS BIGINT)) AS BIGINT)"
                f" AS agg_{i}"
            )
        elif kind in ("min", "max"):
            c = rng.choice(spec["int"] + spec["cat"])
            aggs.append(f"{kind.upper()}({c}) AS agg_{i}")
        else:
            c = rng.choice(spec["int"] + spec["cat"])
            aggs.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS agg_{i}")

    preds = []
    for _ in range(rng.randint(0, 2)):
        if rng.random() < 0.5:
            c = rng.choice(spec["int"])
            op = rng.choice(["<", "<=", ">", ">=", "%"])
            if op == "%":
                preds.append(f"{c} % {rng.randint(2, 7)} = 0")
            else:
                preds.append(f"{c} {op} {rng.randint(1, 5000)}")
        else:
            cats = [c for c in spec["cat"] if c in CAT_VALUES]
            c = rng.choice(cats)
            vals = rng.sample(
                CAT_VALUES[c], k=rng.randint(1, min(3, len(CAT_VALUES[c])))
            )
            lits = ", ".join(
                f"'{v}'" if isinstance(v, str) else str(v) for v in vals
            )
            preds.append(f"{c} IN ({lits})")

    sel = ", ".join(group + aggs)
    sql = f"SELECT {sel} FROM {frm}"
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    if group:
        sql += " GROUP BY " + ", ".join(group)
    return sql


def _all_queries() -> list[tuple[int, str]]:
    rng = random.Random(SEED)
    return [(i, _gen_query(rng)) for i in range(N_QUERIES)]


@pytest.fixture(scope="module")
def spark_views(spark):
    for t in TABLES:
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
    return spark


@pytest.mark.parametrize("idx,sql", _all_queries())
def test_fuzzed_query_matches_duckdb(spark_views, duck, idx, sql):
    got = canonical(spark_views.sql(sql).toPandas())
    want = canonical(duck.execute(sql).fetchdf())
    assert len(got) == len(want), (
        f"[seed {SEED} #{idx}] rows spark={len(got)} duckdb={len(want)}: {sql}"
    )
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, (
        f"[seed {SEED} #{idx}] {len(mism)} mismatched rows; "
        f"first {mism[0]}: {sql}"
    )
