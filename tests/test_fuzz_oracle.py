"""Cross-engine differential SQL fuzzer (round-7 verdict item 8;
grammar widened round 8 per verdict item 6).

The registry's 152 hand-written query/oracle pairs verify specific
shapes; this suite generates SEEDED random ANSI-SQL queries and runs
each on BOTH engines (Spark SQL front-end over the same parquet views,
DuckDB as the oracle), comparing the driver's canonical form. The
grammar stays inside the engines' shared-semantics subset the registry
already relies on:

- integer/count aggregates only (SUM wrapped CAST(... AS BIGINT) —
  DuckDB SUM(BIGINT) returns HUGEINT); doubles enter only through the
  int-cents ROUND(x * 100) discipline;
- MIN/MAX on ints, strings, timestamps (canonicalized via isoformat);
- no bare LIMIT (canonical compare is order-insensitive; a LIMIT
  without a total order would be legitimately nondeterministic on both
  sides) — top-k enters only as a rank predicate over a deterministic
  window;
- predicates on integer ranges and low-cardinality string IN-lists.

Round-8 widening — the shapes where engine semantics actually diverge
(outer-join NULL handling, frame defaults, subquery decorrelation):

- LEFT / RIGHT / FULL OUTER joins (NULL-extended group keys and
  aggregate inputs exercise each engine's NULL discipline);
- HAVING on aggregate expressions (not aliases — Spark resolves HAVING
  against the input, alias references are the non-portable form);
- window functions: RANK / DENSE_RANK over any order (tie-stable, so
  deterministic), ROW_NUMBER / LAG / LEAD and framed aggregates
  (SUM/COUNT with explicit ROWS BETWEEN n PRECEDING frames) only over
  per-table UNIQUE total orders; explicit NULLS FIRST everywhere
  because the engines' DEFAULT null ordering differs (Spark ASC=NULLS
  FIRST, DuckDB ASC=NULLS LAST — exactly the kind of silent divergence
  this suite exists to catch); optional rank<=k predicate via a
  subquery;
- scalar subqueries (uncorrelated MIN/MAX/COUNT thresholds) and IN /
  NOT IN subqueries (NOT IN only over provably non-NULL key columns —
  the three-valued-logic trap is real semantics, not divergence, but a
  NULL in the subquery returns an empty result and tests nothing).

Round-9 widening (r8 verdict item 5) — the next divergence surfaces:

- CORRELATED subqueries: scalar COUNT/MIN/MAX correlated on the join
  key (COUNT over an empty correlated group is the classic "count bug"
  every decorrelation rewrite must get right — it must yield 0, not
  NULL-drop the outer row) and [NOT] EXISTS;
- GROUPING SETS / ROLLUP / CUBE with GROUPING() markers (the marker
  disambiguates rollup-NULL keys from natural NULLs, and its type
  discipline differs across engines — cast to BIGINT). FOUND DIVERGENCE
  (seed 0x5EED #78, round 9): over an EMPTY input relation Spark emits
  NO rows for ROLLUP/CUBE/GROUPING SETS while DuckDB (with Postgres and
  the standard) emits the ()-grouping-set grand-total row with
  COUNT(*) = 0 — the same discipline that makes a global aggregate over
  empty input one row, which Spark itself follows for plain GROUP-BY-
  less aggregates. Triaged in ROUNDLOG.md round 9; the generator below
  therefore draws only non-emptying (modulo) predicates for grouping
  queries so the suite pins the shared semantics, not the known gap;
- RANGE frames with explicit numeric bounds (value-based frames over
  possibly-TIED integer order columns — peers are included by
  definition, so results stay deterministic where a ROWS frame would
  not be; exercises each engine's frame-boundary arithmetic in both
  sort directions).

Round-10 widening (r9 verdict item 7) — the remaining surfaces the
round-9 note called out:

- LATERAL: correlated derived tables — the cross-lateral COUNT(*)
  aggregate form, LEFT JOIN LATERAL scalar MIN/MAX aggregates, and
  LEFT JOIN LATERAL (... ORDER BY unique-key LIMIT k) ON TRUE — the
  per-outer-row top-k that exercises each engine's decorrelation of a
  correlated LIMIT (deterministic because the inner order key is
  unique). FOUND DIVERGENCE (seed 0x5EED #373, round 10): under
  comma/CROSS LATERAL, an empty correlated group makes DuckDB DROP the
  outer row for MIN/MAX lateral aggregates (2534 rows) while
  special-casing COUNT(*) (15000 rows, the count-bug fix applied);
  Spark keeps the standard scalar-aggregate one-row discipline for
  both (15000, MAX = NULL), agreeing with Postgres. All LEFT JOIN
  LATERAL ... ON TRUE forms agree between the engines (including the
  COUNT-0 row), so the generator draws MIN/MAX laterals only in the
  LEFT form and reserves the cross form for COUNT(*). Triaged in
  ROUNDLOG.md round 10;
- interval-bounded RANGE frames over TIMESTAMP order columns
  (INTERVAL 'n' DAY/HOUR bounds; peers included by definition, so ties
  in the timestamp stay deterministic; exercises date-time frame
  boundary arithmetic, a different code path from numeric bounds);
- set operations INSIDE subqueries: IN (sub UNION/INTERSECT/EXCEPT
  sub) and aggregates over set-op derived tables (all three operators
  are DISTINCT-semantics on both engines; UNION ALL enters only under
  an aggregate).

Round-11 widening (r10 verdict item 7) — indexes 500-599, via a
SEPARATE dispatcher so the frozen 0-499 corpus stays byte-identical:

- QUALIFY-equivalent window filters: windowed MAX/MIN compared to a
  row value in the outer WHERE (per-group argmax / threshold — the
  window-then-filter pipeline QUALIFY sugars);
- multiple DISTINCT aggregates on different columns in one SELECT
  (Spark's Expand-based multi-distinct rewrite) plus SUM(DISTINCT);
- NULLS FIRST/LAST sweeps on window ORDER BY over NULLIF-produced
  NULL order keys, both directions, tie-stable ranks only;
- aggregate FILTER clauses, mixed filtered/unfiltered in one SELECT
  (Spark lowers FILTER to agg(CASE WHEN ...); COUNT over an empty
  filter match must be 0, MIN/MAX must be NULL).

Round-12 widening (r11 verdict item 6) — indexes 600-699, own frozen
dispatcher:

- GROUPING SETS/ROLLUP/CUBE x DISTINCT aggregates (stacked Expand
  rewrites with interacting grouping-id columns; modulo-only
  predicates per the round-9 empty-input discipline);
- INTERSECT ALL / EXCEPT ALL bag multiplicity (min(m1,m2) /
  max(m1-m2,0) arithmetic), compared via per-key COUNT(*);
- decimal rounding/scale boundaries (double->DECIMAL casts, ROUND to
  smaller scale, exact re-scaling to BIGINT so no raw decimal reaches
  the canonical compare);
- interval arithmetic at timestamp boundaries (ts ± n DAY/HOUR/MINUTE
  through EXTRACT grouping, shifted MIN/MAX, shifted-vs-literal
  predicates).

Round-13 widening (r12 verdict item 7) — indexes 700-799, own frozen
dispatcher:

- correlated [NOT] EXISTS under set operations (decorrelation inside
  UNION/INTERSECT/EXCEPT[ ALL] children);
- ROWS-framed window aggregates over DISTINCT-aggregate results (the
  Expand rewrite feeding Window, ordered by the unique group key);
- string ordering edges — mixed-case, empty-string, tie-heavy prefix
  and concatenated keys, ranked in both directions plus windowed
  MIN/MAX (pins the shared raw-codepoint default against any
  locale-aware collation drift);
- UNION type-coercion corners — mixed integer widths (in-range only:
  ANSI Spark and DuckDB both error on overflow), typed-NULL branches,
  DECIMAL scale widening re-scaled exactly to BIGINT, INT-vs-DOUBLE
  consumed only through MIN/MAX/COUNT (never a cross-engine double
  SUM, which would compare summation order, not coercion).

Seeded with a fixed constant and a PER-INDEX rng (``Random(f"{SEED}:
{i}")``), so every run generates the identical 500 queries AND future
grammar widenings that append indexes leave existing queries
byte-identical — a failure is reproducible by seed index across
rounds. ONE-TIME CORPUS BREAK (round-10 advisor note): the switch
from a single shared rng to the per-index rng in round 10 regenerated
the whole corpus once, so seed-index citations from rounds <= 9
(e.g. the r9 ROLLUP divergence "#78") refer to the OLD corpus and do
not reproduce against the current one — indexes were effectively
renumbered in round 10. Citations from round 10 onward are stable.
"""

from __future__ import annotations

import random

import pytest

from data_wrangling_spark.sources.tables import load_table
from tests.conftest import SF_DIR, canonical

N_QUERIES = 800          # 0-499: r7-r10; 500-599: r11; 600-699: r12; 700-799: r13
N_QUERIES_R10 = 500      # indexes below this use the frozen r10 dispatcher
N_QUERIES_R11 = 600      # 500..599 use the frozen r11 dispatcher
N_QUERIES_R12 = 700      # 600..699 use the frozen r12 dispatcher
SEED = 0x5EED

#: (table, categorical cols, integer cols, cents cols, ts col)
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

#: per-table UNIQUE total-order key — the only safe ORDER BY for
#: order-sensitive window functions (ROW_NUMBER/LAG/LEAD). lineitem has
#: NO unique key at sf0.01 ((l_orderkey, l_linenumber) collides there —
#: TESTDATA gotcha), so it gets only tie-stable RANK/DENSE_RANK.
UNIQUE_KEY = {"orders": "o_orderkey", "customer": "c_custkey",
              "events": "event_id"}

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


def _preds(rng: random.Random, spec: dict, n_max: int = 2) -> list[str]:
    preds = []
    for _ in range(rng.randint(0, n_max)):
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
    return preds


def _gen_agg_query(rng: random.Random) -> str:
    """Aggregates over a table or a (possibly OUTER) join, optional
    WHERE / GROUP BY / HAVING — the original round-7 grammar plus join
    types and HAVING."""
    if rng.random() < 0.4:
        lt, rt, lk, rk = rng.choice(JOINS)
        jt = rng.choice(["JOIN", "JOIN", "LEFT JOIN", "RIGHT JOIN",
                         "FULL JOIN"])
        frm = f"{lt} {jt} {rt} ON {lt}.{lk} = {rt}.{rk}"
        spec = {
            "cat": TABLES[lt]["cat"] + TABLES[rt]["cat"],
            "int": TABLES[lt]["int"] + TABLES[rt]["int"],
            "cents": TABLES[lt]["cents"] + TABLES[rt]["cents"],
        }
        # predicates only on the LEFT table for outer joins: a WHERE on
        # the null-extended side silently degrades to inner on both
        # engines (same semantics, but it would mask the NULL paths this
        # shape exists to exercise)
        pred_spec = TABLES[lt] if jt != "JOIN" else spec
    else:
        t = rng.choice(list(TABLES))
        frm = t
        spec = TABLES[t]
        pred_spec = spec

    group = rng.sample(spec["cat"], k=rng.randint(0, min(2, len(spec["cat"]))))

    aggs = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(["count", "count_col", "sum_int", "sum_cents",
                           "min", "max", "count_distinct"])
        i = len(aggs)
        if kind == "count":
            aggs.append(f"COUNT(*) AS agg_{i}")
        elif kind == "count_col":
            # COUNT(col) skips NULLs — differs from COUNT(*) exactly on
            # the outer joins' null-extended rows
            c = rng.choice(spec["int"] + spec["cat"])
            aggs.append(f"COUNT({c}) AS agg_{i}")
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

    preds = _preds(rng, pred_spec)
    sel = ", ".join(group + aggs)
    sql = f"SELECT {sel} FROM {frm}"
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    if group:
        sql += " GROUP BY " + ", ".join(group)
        if rng.random() < 0.4:
            # HAVING on full aggregate EXPRESSIONS (alias references in
            # HAVING are the non-portable form)
            if rng.random() < 0.5:
                sql += f" HAVING COUNT(*) >= {rng.randint(2, 20)}"
            else:
                c = rng.choice(spec["int"])
                sql += f" HAVING MIN({c}) > {rng.randint(1, 2000)}"
    return sql


def _gen_window_query(rng: random.Random) -> str:
    """Window functions over one table: tie-stable ranks everywhere,
    order-sensitive functions only over the table's unique key, explicit
    NULLS FIRST (the engines' defaults differ), optional top-k via a
    rank predicate in an outer query."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    part = rng.choice([c for c in spec["cat"] if c in CAT_VALUES])
    choices = ["rank", "dense_rank"]
    if t in UNIQUE_KEY:
        # framed aggregate windows (explicit ROWS frame — the default
        # frame is RANGE-with-peers on both engines, but explicit ROWS
        # over a unique total order is the deterministic shape that
        # exercises frame arithmetic)
        choices += ["row_number", "lag", "lead", "sum_frame", "cnt_frame"]
    fn = rng.choice(choices)
    if fn in ("rank", "dense_rank"):
        order_col = rng.choice(spec["int"])
    else:
        order_col = UNIQUE_KEY[t]
    direction = rng.choice(["ASC", "DESC"])
    over = (f"PARTITION BY {part} ORDER BY {order_col} {direction} "
            f"NULLS FIRST")
    if fn in ("lag", "lead"):
        val = rng.choice(spec["int"])
        wexpr = f"{fn.upper()}({val}, 1) OVER ({over})"
    elif fn == "row_number":
        wexpr = f"ROW_NUMBER() OVER ({over})"
    elif fn in ("sum_frame", "cnt_frame"):
        lo = rng.randint(1, 4)
        hi = rng.choice(["CURRENT ROW", "1 FOLLOWING"])
        frame = f"ROWS BETWEEN {lo} PRECEDING AND {hi}"
        if fn == "sum_frame":
            val = rng.choice(spec["int"])
            wexpr = f"SUM({val}) OVER ({over} {frame})"
        else:
            wexpr = f"COUNT(*) OVER ({over} {frame})"
    else:
        wexpr = f"{fn.upper()}() OVER ({over})"
    preds = _preds(rng, spec, n_max=1)
    # c_nationkey is both categorical and integer: when the partition
    # and order columns coincide, select it once (duplicate column
    # labels break the pandas-side canonical compare, not the engines)
    sel_cols = [part] if part == order_col else [part, order_col]
    inner = (f"SELECT {', '.join(sel_cols)}, CAST({wexpr} AS BIGINT) AS w_0 "
             f"FROM {t}")
    if preds:
        inner += " WHERE " + " AND ".join(preds)
    if fn in ("rank", "dense_rank", "row_number") and rng.random() < 0.5:
        return (f"SELECT * FROM ({inner}) ranked "
                f"WHERE w_0 <= {rng.randint(1, 5)}")
    return inner


def _gen_subquery_query(rng: random.Random) -> str:
    """Scalar and IN / NOT IN subqueries (uncorrelated, integer-pure).
    NOT IN only over join-key columns that are provably non-NULL in the
    generated data — one NULL in a NOT IN list empties the result by
    three-valued logic on BOTH engines (same semantics, zero signal)."""
    lt, rt, lk, rk = rng.choice(JOINS)
    spec = TABLES[lt]
    kind = rng.choice(["scalar", "in", "not_in"])
    if kind == "scalar":
        agg = rng.choice(["MIN", "MAX"])
        sub_pred = _preds(rng, TABLES[rt], n_max=1)
        sub = f"SELECT {agg}({rk}) FROM {rt}"
        if sub_pred:
            sub += " WHERE " + " AND ".join(sub_pred)
        op = rng.choice(["<", "<=", ">", ">="])
        where = f"{lk} {op} ({sub})"
    else:
        sub_pred = _preds(rng, TABLES[rt], n_max=1)
        sub = f"SELECT {rk} FROM {rt}"
        if sub_pred:
            sub += " WHERE " + " AND ".join(sub_pred)
        neg = "NOT " if kind == "not_in" else ""
        where = f"{lk} {neg}IN ({sub})"
    group = rng.sample(spec["cat"], k=rng.randint(0, 1))
    aggs = [f"COUNT(*) AS agg_0",
            f"CAST(SUM({rng.choice(spec['int'])}) AS BIGINT) AS agg_1"]
    sel = ", ".join(group + aggs)
    sql = f"SELECT {sel} FROM {lt} WHERE {where}"
    if group:
        sql += " GROUP BY " + ", ".join(group)
    return sql


def _gen_correlated_query(rng: random.Random) -> str:
    """Correlated subqueries on the join keys: scalar aggregates
    (COUNT exercises the count bug — an outer row with NO correlated
    matches must see 0, not vanish; MIN/MAX yield NULL there, making
    the predicate three-valued) and [NOT] EXISTS semi/anti shapes."""
    lt, rt, lk, rk = rng.choice(JOINS)
    spec = TABLES[lt]
    kind = rng.choice(["count", "minmax", "exists", "not_exists"])
    sub_pred = _preds(rng, TABLES[rt], n_max=1)
    corr = f"{rt}.{rk} = {lt}.{lk}"
    if kind == "count":
        sub = f"SELECT COUNT(*) FROM {rt} WHERE {corr}"
        if sub_pred:
            sub += " AND " + " AND ".join(sub_pred)
        op = rng.choice(["=", ">=", "<=", ">"])
        where = f"({sub}) {op} {rng.randint(0, 5)}"
    elif kind == "minmax":
        agg = rng.choice(["MIN", "MAX"])
        val = rng.choice(TABLES[rt]["int"])
        sub = f"SELECT {agg}({val}) FROM {rt} WHERE {corr}"
        if sub_pred:
            sub += " AND " + " AND ".join(sub_pred)
        c = rng.choice(spec["int"])
        op = rng.choice(["<", "<=", ">", ">="])
        where = f"{c} {op} ({sub})"
    else:
        sub = f"SELECT 1 FROM {rt} WHERE {corr}"
        if sub_pred:
            sub += " AND " + " AND ".join(sub_pred)
        neg = "NOT " if kind == "not_exists" else ""
        where = f"{neg}EXISTS ({sub})"
    outer_pred = _preds(rng, spec, n_max=1)
    if outer_pred:
        where += " AND " + " AND ".join(outer_pred)
    group = rng.sample(spec["cat"], k=rng.randint(0, 1))
    aggs = ["COUNT(*) AS agg_0",
            f"CAST(SUM({rng.choice(spec['int'])}) AS BIGINT) AS agg_1"]
    sel = ", ".join(group + aggs)
    sql = f"SELECT {sel} FROM {lt} WHERE {where}"
    if group:
        sql += " GROUP BY " + ", ".join(group)
    return sql


def _gen_grouping_query(rng: random.Random) -> str:
    """ROLLUP / CUBE / explicit GROUPING SETS over one table's
    categorical pair, with GROUPING() markers cast to BIGINT so the
    rollup-generated NULL keys are distinguishable from natural NULLs
    in the canonical compare.

    Predicates here are MODULO-only (never range): a range predicate
    can empty the input, where the engines genuinely diverge — Spark
    emits no rows, DuckDB/ANSI emit the () grand-total row (divergence
    documented in the module docstring and ROUNDLOG round 9)."""
    t = rng.choice([t for t, s in TABLES.items() if len(set(s["cat"])) >= 2])
    spec = TABLES[t]
    g1, g2 = rng.sample(sorted(set(spec["cat"])), k=2)
    shape = rng.choice(["ROLLUP", "CUBE", "SETS"])
    if shape == "SETS":
        all_sets = [f"({g1})", f"({g2})", f"({g1}, {g2})", "()"]
        sets = rng.sample(all_sets, k=rng.randint(2, 4))
        # GROUPING(col) binds only if col appears in at least one
        # grouping set (DuckDB binder error otherwise — round-10 draw
        # #450 sampled sets covering g1 but not g2); force coverage
        # via the pair set, which mentions both. Substring test is
        # safe: no generated column name contains another.
        if not all(any(g in s for s in sets) for g in (g1, g2)):
            if f"({g1}, {g2})" not in sets:
                sets.append(f"({g1}, {g2})")
        grouping = f"GROUPING SETS ({', '.join(sets)})"
    else:
        grouping = f"{shape}({g1}, {g2})"
    aggs = ["COUNT(*) AS agg_0"]
    if rng.random() < 0.7:
        c = rng.choice(spec["int"])
        aggs.append(f"CAST(SUM({c}) AS BIGINT) AS agg_1")
    sel = (f"{g1}, {g2}, CAST(GROUPING({g1}) AS BIGINT) AS grp_1, "
           f"CAST(GROUPING({g2}) AS BIGINT) AS grp_2, " + ", ".join(aggs))
    sql = f"SELECT {sel} FROM {t}"
    if rng.random() < 0.5:
        c = rng.choice(spec["int"])
        sql += f" WHERE {c} % {rng.randint(2, 7)} = 0"
    sql += f" GROUP BY {grouping}"
    return sql


def _gen_range_frame_query(rng: random.Random) -> str:
    """Value-based RANGE frames with explicit integer bounds: peers are
    included by definition, so any integer order column is
    deterministic even with ties (unlike ROWS frames, which need the
    unique-key restriction)."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    part = rng.choice([c for c in spec["cat"] if c in CAT_VALUES])
    order_col = rng.choice([c for c in spec["int"] if c != part])
    direction = rng.choice(["ASC", "DESC"])
    lo, hi = rng.randint(1, 1000), rng.randint(1, 1000)
    frame = rng.choice([
        f"RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW",
        f"RANGE BETWEEN CURRENT ROW AND {hi} FOLLOWING",
        f"RANGE BETWEEN {lo} PRECEDING AND {hi} FOLLOWING",
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    ])
    agg = rng.choice(["COUNT(*)", f"SUM({rng.choice(spec['int'])})",
                      f"MIN({order_col})", f"MAX({order_col})"])
    over = (f"PARTITION BY {part} ORDER BY {order_col} {direction} "
            f"NULLS FIRST {frame}")
    preds = _preds(rng, spec, n_max=1)
    sql = (f"SELECT {part}, {order_col}, "
           f"CAST({agg} OVER ({over}) AS BIGINT) AS w_0 FROM {t}")
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    return sql


def _gen_lateral_query(rng: random.Random) -> str:
    """Correlated derived tables (round-10). Two shapes:

    - lateral scalar aggregate — ``LATERAL (SELECT agg(...) FROM rt
      WHERE rt.rk = lt.lk [AND pred]) s``: COUNT sees the count-bug
      path, MIN/MAX the NULL-on-empty path, routed through each
      engine's LATERAL decorrelation instead of the scalar-subquery
      rewrite _gen_correlated_query exercises. The comma/CROSS form is
      drawn ONLY for COUNT(*): DuckDB drops the outer row when a
      MIN/MAX lateral group is empty under CROSS LATERAL (module
      docstring, divergence #373) while Spark/Postgres keep the
      scalar-aggregate one-row discipline, so MIN/MAX enter only as
      LEFT JOIN LATERAL ... ON TRUE, where the engines agree;
    - LEFT JOIN LATERAL (... ORDER BY rt-unique-key DESC LIMIT k) ON
      TRUE — per-outer-row top-k, the shape that needs a correlated
      LIMIT; deterministic because the inner order key is unique, and
      the LEFT join keeps match-less outer rows (NULL-extended lateral
      columns feed COUNT(col) vs COUNT(*))."""
    lt, rt, lk, rk = rng.choice(JOINS)
    spec = TABLES[lt]
    sub_pred = _preds(rng, TABLES[rt], n_max=1)
    aggs = ["COUNT(*) AS agg_0", "COUNT(lat_v) AS agg_1",
            "CAST(SUM(lat_v) AS BIGINT) AS agg_2"]
    if rt in UNIQUE_KEY and rng.random() < 0.5:
        val = rng.choice(TABLES[rt]["int"])
        k = rng.randint(1, 3)
        sub = (f"SELECT {val} AS lat_v FROM {rt} "
               f"WHERE {rt}.{rk} = {lt}.{lk}")
        if sub_pred:
            sub += " AND " + " AND ".join(sub_pred)
        sub += f" ORDER BY {rt}.{UNIQUE_KEY[rt]} DESC LIMIT {k}"
        frm = f"{lt} LEFT JOIN LATERAL ({sub}) lat ON TRUE"
    else:
        kind = rng.choice(["COUNT(*)", "MIN", "MAX"])
        if kind == "COUNT(*)":
            inner_agg = "COUNT(*)"
        else:
            inner_agg = f"{kind}({rng.choice(TABLES[rt]['int'])})"
        sub = (f"SELECT {inner_agg} AS lat_v FROM {rt} "
               f"WHERE {rt}.{rk} = {lt}.{lk}")
        if sub_pred:
            sub += " AND " + " AND ".join(sub_pred)
        if kind == "COUNT(*)":
            frm = f"{lt}, LATERAL ({sub}) lat"
        else:
            frm = f"{lt} LEFT JOIN LATERAL ({sub}) lat ON TRUE"
    group = rng.sample(spec["cat"], k=rng.randint(0, 1))
    outer_pred = _preds(rng, spec, n_max=1)
    sel = ", ".join(group + aggs)
    sql = f"SELECT {sel} FROM {frm}"
    if outer_pred:
        sql += " WHERE " + " AND ".join(outer_pred)
    if group:
        sql += " GROUP BY " + ", ".join(group)
    return sql


def _gen_interval_range_query(rng: random.Random) -> str:
    """Interval-bounded RANGE frames over TIMESTAMP order columns
    (round-10): date-time frame-boundary arithmetic is a separate code
    path from the numeric bounds _gen_range_frame_query covers. Peers
    are included by definition so timestamp ties stay deterministic;
    the driver's ts columns are non-NULL at every scale, and NULLS
    FIRST stays explicit anyway (the engines' defaults differ)."""
    t = rng.choice([t for t, s in TABLES.items() if s["ts"]])
    spec = TABLES[t]
    ts = spec["ts"]
    part = rng.choice([c for c in spec["cat"] if c in CAT_VALUES])
    direction = rng.choice(["ASC", "DESC"])
    unit = rng.choice(["DAY", "HOUR"])
    lo = rng.randint(1, 30) if unit == "DAY" else rng.randint(1, 72)
    hi = rng.randint(1, 30) if unit == "DAY" else rng.randint(1, 72)
    frame = rng.choice([
        f"RANGE BETWEEN INTERVAL '{lo}' {unit} PRECEDING AND CURRENT ROW",
        f"RANGE BETWEEN CURRENT ROW AND INTERVAL '{hi}' {unit} FOLLOWING",
        f"RANGE BETWEEN INTERVAL '{lo}' {unit} PRECEDING "
        f"AND INTERVAL '{hi}' {unit} FOLLOWING",
    ])
    agg = rng.choice(["COUNT(*)", f"SUM({rng.choice(spec['int'])})",
                      f"MIN({rng.choice(spec['int'])})"])
    over = f"PARTITION BY {part} ORDER BY {ts} {direction} NULLS FIRST {frame}"
    preds = _preds(rng, spec, n_max=1)
    sql = (f"SELECT {part}, {ts}, "
           f"CAST({agg} OVER ({over}) AS BIGINT) AS w_0 FROM {t}")
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    return sql


def _gen_setop_subquery(rng: random.Random) -> str:
    """Set operations nested inside subqueries (round-10): IN over a
    UNION/INTERSECT/EXCEPT of two key-producing branches, and
    aggregates over a set-op derived table. All three operators are
    DISTINCT-semantics on both engines; UNION ALL enters only under an
    aggregate (its duplicates are deterministic)."""
    lt, rt, lk, rk = rng.choice(JOINS)
    op = rng.choice(["UNION", "INTERSECT", "EXCEPT", "UNION ALL"])
    p1 = _preds(rng, TABLES[rt], n_max=1)
    p2 = _preds(rng, TABLES[rt], n_max=1)
    b1 = f"SELECT {rk} AS k FROM {rt}"
    if p1:
        b1 += " WHERE " + " AND ".join(p1)
    b2 = f"SELECT {rk} AS k FROM {rt}"
    if p2:
        b2 += " WHERE " + " AND ".join(p2)
    if op != "UNION ALL" and rng.random() < 0.5:
        # IN strips duplicates itself, so UNION ALL adds nothing there
        spec = TABLES[lt]
        group = rng.sample(spec["cat"], k=rng.randint(0, 1))
        aggs = ["COUNT(*) AS agg_0",
                f"CAST(SUM({rng.choice(spec['int'])}) AS BIGINT) AS agg_1"]
        sel = ", ".join(group + aggs)
        sql = f"SELECT {sel} FROM {lt} WHERE {lk} IN ({b1} {op} {b2})"
        outer_pred = _preds(rng, spec, n_max=1)
        if outer_pred:
            sql += " AND " + " AND ".join(outer_pred)
        if group:
            sql += " GROUP BY " + ", ".join(group)
        return sql
    return (f"SELECT COUNT(*) AS agg_0, CAST(SUM(k) AS BIGINT) AS agg_1, "
            f"MIN(k) AS agg_2, MAX(k) AS agg_3 FROM ({b1} {op} {b2}) u")


def _gen_qualify_query(rng: random.Random) -> str:
    """QUALIFY-equivalent window filters (round-11): the classic
    per-group argmax/threshold — a windowed aggregate computed in a
    derived table and compared against a ROW value in the outer WHERE
    (`WHERE col = w_max`), the pattern QUALIFY sugars in engines that
    have it. Deterministic with ties: every tied row passes the filter
    on both engines. Exercises each engine's window-then-filter
    pipeline (Spark must not push the predicate below the window)."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    part = rng.choice([c for c in spec["cat"] if c in CAT_VALUES])
    val = rng.choice([c for c in spec["int"] if c != part])
    agg = rng.choice(["MAX", "MIN"])
    wexpr = f"{agg}({val}) OVER (PARTITION BY {part})"
    preds = _preds(rng, spec, n_max=1)
    inner = (f"SELECT {part}, {val}, CAST({wexpr} AS BIGINT) AS w_0 "
             f"FROM {t}")
    if preds:
        inner += " WHERE " + " AND ".join(preds)
    if rng.random() < 0.5:
        cond = f"{val} = w_0"          # argmax/argmin rows per group
    else:
        # threshold against the group aggregate (e.g. above-group-min)
        cond = f"{val} {'<' if agg == 'MAX' else '>'} w_0"
    return f"SELECT * FROM ({inner}) q WHERE {cond}"


def _gen_multi_distinct_agg(rng: random.Random) -> str:
    """Multiple DISTINCT aggregates on DIFFERENT columns in one SELECT
    (round-11): Spark plans this via an Expand (one projection per
    distinct group) + two-stage aggregate — a rewrite with its own bug
    surface that single-distinct queries never touch. Mixed with a
    plain aggregate so the expand carries a non-distinct branch too;
    SUM(DISTINCT) enters on ints (exact) and int-cents."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    group = rng.sample(spec["cat"], k=rng.randint(0, 1))
    c1, c2 = rng.sample(spec["int"], k=2) if len(spec["int"]) >= 2 else (
        spec["int"][0], spec["cat"][0])
    aggs = [f"CAST(COUNT(DISTINCT {c1}) AS BIGINT) AS agg_0",
            f"CAST(COUNT(DISTINCT {c2}) AS BIGINT) AS agg_1"]
    kind = rng.choice(["sum_distinct", "plain_sum", "count"])
    if kind == "sum_distinct":
        aggs.append(f"CAST(SUM(DISTINCT {rng.choice(spec['int'])}) AS BIGINT)"
                    " AS agg_2")
    elif kind == "plain_sum":
        c = rng.choice(spec["cents"])
        aggs.append(f"CAST(SUM(CAST(ROUND({c} * 100, 0) AS BIGINT)) "
                    "AS BIGINT) AS agg_2")
    else:
        aggs.append("COUNT(*) AS agg_2")
    preds = _preds(rng, spec, n_max=1)
    sql = f"SELECT {', '.join(group + aggs)} FROM {t}"
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    if group:
        sql += " GROUP BY " + ", ".join(group)
    return sql


def _gen_null_order_window(rng: random.Random) -> str:
    """NULLS FIRST / NULLS LAST sweeps on window ORDER BY (round-11)
    over an order expression that actually PRODUCES NULLs
    (`NULLIF(col % k, 0)` — base columns are non-NULL, where the
    null-ordering clause would be dead). Tie-stable RANK/DENSE_RANK
    only (NULL groups are rank-tied, so results stay deterministic in
    all four direction x null-placement combinations). The engines'
    DEFAULTS differ (Spark ASC=NULLS FIRST, DuckDB ASC=NULLS LAST),
    so every combination is spelled explicitly."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    part = rng.choice([c for c in spec["cat"] if c in CAT_VALUES])
    oc = rng.choice(spec["int"])
    k = rng.randint(2, 6)
    direction = rng.choice(["ASC", "DESC"])
    nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
    fn = rng.choice(["RANK", "DENSE_RANK"])
    wexpr = (f"{fn}() OVER (PARTITION BY {part} "
             f"ORDER BY NULLIF({oc} % {k}, 0) {direction} {nulls})")
    preds = _preds(rng, spec, n_max=1)
    sel_part = [part] if part == oc else [part, oc]
    sql = (f"SELECT {', '.join(sel_part)}, "
           f"CAST({wexpr} AS BIGINT) AS w_0 FROM {t}")
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    return sql


def _gen_filter_agg(rng: random.Random) -> str:
    """Aggregate FILTER clauses (round-11): `agg(x) FILTER (WHERE p)`
    — standard SQL both engines support natively, but each lowers
    differently (Spark rewrites to agg(CASE WHEN ...)); mixed
    filtered/unfiltered aggregates in one SELECT exercise the rewrite
    alongside an unfiltered sibling. COUNT FILTER over an empty match
    must be 0 while MIN/MAX FILTER must be NULL — the same
    empty-group discipline the correlated generator pins."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    group = rng.sample(spec["cat"], k=rng.randint(0, 1))
    fpreds = _preds(rng, spec, n_max=1) or [
        f"{rng.choice(spec['int'])} % {rng.randint(2, 5)} = 0"
    ]
    fl = f" FILTER (WHERE {' AND '.join(fpreds)})"
    aggs = []
    for i in range(rng.randint(2, 3)):
        kind = rng.choice(["count", "sum", "minmax"])
        use_f = fl if (i == 0 or rng.random() < 0.6) else ""
        if kind == "count":
            aggs.append(f"COUNT(*){use_f} AS agg_{i}")
        elif kind == "sum":
            c = rng.choice(spec["int"])
            aggs.append(f"CAST(SUM({c}){use_f} AS BIGINT) AS agg_{i}")
        else:
            c = rng.choice(spec["int"])
            aggs.append(f"{rng.choice(['MIN', 'MAX'])}({c}){use_f}"
                        f" AS agg_{i}")
    preds = _preds(rng, spec, n_max=1)
    sql = f"SELECT {', '.join(group + aggs)} FROM {t}"
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    if group:
        sql += " GROUP BY " + ", ".join(group)
    return sql


def _gen_grouping_distinct(rng: random.Random) -> str:
    """GROUPING SETS / ROLLUP / CUBE x DISTINCT aggregates (round-12):
    Spark must compose its Expand-based multi-distinct rewrite with the
    Expand the grouping-set lowering already inserts — two stacked
    Expands with interacting grouping-id columns, a surface neither the
    round-9 grouping generator (plain aggs) nor the round-11
    multi-distinct generator (plain GROUP BY) touches. Predicates stay
    MODULO-only per the round-9 discipline (an emptied input diverges
    by the documented Spark-vs-ANSI grand-total-row gap)."""
    t = rng.choice([t for t, s in TABLES.items() if len(set(s["cat"])) >= 2])
    spec = TABLES[t]
    g1, g2 = rng.sample(sorted(set(spec["cat"])), k=2)
    shape = rng.choice(["ROLLUP", "CUBE"])
    grouping = f"{shape}({g1}, {g2})"
    c1 = rng.choice(spec["int"])
    aggs = [f"CAST(COUNT(DISTINCT {c1}) AS BIGINT) AS agg_0",
            "COUNT(*) AS agg_1"]
    kind = rng.choice(["sum_distinct", "second_count", "none"])
    if kind == "sum_distinct":
        aggs.append(f"CAST(SUM(DISTINCT {rng.choice(spec['int'])}) "
                    "AS BIGINT) AS agg_2")
    elif kind == "second_count" and len(spec["int"]) >= 2:
        c2 = rng.choice([c for c in spec["int"] if c != c1])
        aggs.append(f"CAST(COUNT(DISTINCT {c2}) AS BIGINT) AS agg_2")
    sel = (f"{g1}, {g2}, CAST(GROUPING({g1}) AS BIGINT) AS grp_1, "
           f"CAST(GROUPING({g2}) AS BIGINT) AS grp_2, " + ", ".join(aggs))
    sql = f"SELECT {sel} FROM {t}"
    if rng.random() < 0.5:
        c = rng.choice(spec["int"])
        sql += f" WHERE {c} % {rng.randint(2, 7)} = 0"
    sql += f" GROUP BY {grouping}"
    return sql


def _gen_setop_all(rng: random.Random) -> str:
    """INTERSECT ALL / EXCEPT ALL multiplicity semantics (round-12):
    bag-semantics set ops — each output row's multiplicity is
    min(m1, m2) for INTERSECT ALL and max(m1 - m2, 0) for EXCEPT ALL,
    arithmetic the DISTINCT-semantics operators (already fuzzed round
    10) never exercise. Branches draw from the SAME table with
    different predicates so overlap is guaranteed and schemas match by
    construction; the outer GROUP BY + COUNT(*) makes the multiplicity
    itself the compared value while bounding output size."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    cat = rng.choice([c for c in spec["cat"] if c in CAT_VALUES])
    ic = rng.choice(spec["int"])
    k = rng.randint(3, 9)
    cols = f"{cat} AS k_0, {ic} % {k} AS k_1"

    def branch() -> str:
        preds = _preds(rng, spec, n_max=1)
        b = f"SELECT {cols} FROM {t}"
        if preds:
            b += " WHERE " + " AND ".join(preds)
        return b

    op = rng.choice(["INTERSECT ALL", "EXCEPT ALL"])
    return (f"SELECT k_0, k_1, COUNT(*) AS agg_0 "
            f"FROM ({branch()} {op} {branch()}) u GROUP BY k_0, k_1")


def _gen_decimal_query(rng: random.Random) -> str:
    """Decimal rounding/scale boundaries (round-12): double -> DECIMAL
    casts, decimal x int products (scale-preserving), ROUND to a
    smaller scale (both engines round half away from zero), and an
    exact re-scaling to BIGINT so no raw decimal ever reaches the
    canonical compare (Spark hands pandas Decimal objects, DuckDB
    float64 — comparing them would test the fetch path, not the
    engines). Magnitudes stay far from DECIMAL(18) overflow: Spark
    NULLs on overflow where DuckDB errors, a documented non-ANSI gap,
    not a silent divergence this suite could catch."""
    t = rng.choice([t for t in TABLES if TABLES[t]["cents"]])
    spec = TABLES[t]
    c = rng.choice(spec["cents"])
    scale = rng.choice([2, 3])
    m = rng.randint(2, 999)
    r = rng.randint(0, scale - 1)
    dec = f"CAST({c} AS DECIMAL(18,{scale}))"
    expr = f"ROUND({dec} * {m}, {r}) * {10 ** r}"
    group = rng.sample([c2 for c2 in spec["cat"] if c2 in CAT_VALUES],
                       k=rng.randint(0, 1))
    aggs = [f"CAST(SUM({expr}) AS BIGINT) AS agg_0",
            f"CAST(MIN({expr}) AS BIGINT) AS agg_1",
            f"CAST(MAX({expr}) AS BIGINT) AS agg_2",
            "COUNT(*) AS agg_3"]
    preds = _preds(rng, spec, n_max=1)
    sql = f"SELECT {', '.join(group + aggs)} FROM {t}"
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    if group:
        sql += " GROUP BY " + ", ".join(group)
    return sql


#: in-range timestamp literals per ts column (testdata ranges: orders/
#: lineitem 1995-2001, events 2024-01) — shifted comparisons stay
#: selective instead of all-true/all-false
_TS_LITERALS = {
    "o_orderdate": ["1996-03-01", "1998-07-15", "2000-11-30"],
    "l_shipdate": ["1996-03-01", "1998-07-15", "2000-11-30"],
    "ts": ["2024-01-05", "2024-01-17", "2024-01-28"],
}


def _gen_interval_ts_query(rng: random.Random) -> str:
    """Interval arithmetic at timestamp edges (round-12): ts ± INTERVAL
    n DAY/HOUR/MINUTE crossing day/month/year boundaries (the testdata
    is UTC, so this pins pure calendar arithmetic, not zone rules),
    consumed three ways — EXTRACT field grouping on the shifted value,
    MIN/MAX of the shifted timestamp itself (isoformat-canonicalized),
    and a shifted-vs-literal WHERE comparison. EXTRACT output is cast
    to BIGINT (the engines' natural EXTRACT types differ)."""
    t = rng.choice([t for t in TABLES if TABLES[t]["ts"]])
    spec = TABLES[t]
    ts = spec["ts"]
    n = rng.randint(1, 400)
    unit = rng.choice(["DAY", "HOUR", "MINUTE"])
    sign = rng.choice(["+", "-"])
    shifted = f"({ts} {sign} INTERVAL {n} {unit})"
    field = rng.choice(["YEAR", "MONTH", "DAY", "HOUR"])
    grp = f"CAST(EXTRACT({field} FROM {shifted}) AS BIGINT)"
    sql = (f"SELECT {grp} AS k_0, COUNT(*) AS agg_0, "
           f"MIN({shifted}) AS agg_1, MAX({shifted}) AS agg_2 FROM {t}")
    preds = []
    if rng.random() < 0.6:
        lit = rng.choice(_TS_LITERALS[ts])
        op = rng.choice(["<", ">="])
        preds.append(f"{shifted} {op} TIMESTAMP '{lit}'")
    preds.extend(_preds(rng, spec, n_max=1))
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    return sql + " GROUP BY k_0"


def _gen_exists_setop(rng: random.Random) -> str:
    """Correlated [NOT] EXISTS under set operations (round-13): each
    branch of a UNION/INTERSECT/EXCEPT[ ALL] is a correlated semi/anti
    query — the decorrelation rewrite must run INSIDE a set-op child,
    where Spark plans each branch independently and DuckDB may flatten
    the set op first. Branches draw from the SAME outer table with the
    same projected keys, so schemas match by construction and overlap
    is guaranteed; the outer GROUP BY + COUNT(*) bounds output and (for
    the ALL forms) makes the bag multiplicity the compared value."""
    lt, rt, lk, rk = rng.choice(JOINS)
    spec = TABLES[lt]
    cat = rng.choice([c for c in spec["cat"] if c in CAT_VALUES])
    ic = rng.choice(spec["int"])
    k = rng.randint(3, 9)
    cols = f"{cat} AS k_0, {ic} % {k} AS k_1"

    def branch() -> str:
        neg = "NOT " if rng.random() < 0.4 else ""
        sub = f"SELECT 1 FROM {rt} WHERE {rt}.{rk} = {lt}.{lk}"
        sub_pred = _preds(rng, TABLES[rt], n_max=1)
        if sub_pred:
            sub += " AND " + " AND ".join(sub_pred)
        b = f"SELECT {cols} FROM {lt} WHERE {neg}EXISTS ({sub})"
        outer_pred = _preds(rng, spec, n_max=1)
        if outer_pred:
            b += " AND " + " AND ".join(outer_pred)
        return b

    op = rng.choice(["UNION", "INTERSECT", "EXCEPT",
                     "INTERSECT ALL", "EXCEPT ALL"])
    return (f"SELECT k_0, k_1, COUNT(*) AS agg_0 "
            f"FROM ({branch()} {op} {branch()}) u GROUP BY k_0, k_1")


def _gen_window_over_distinct(rng: random.Random) -> str:
    """Framed window aggregates OVER the result of DISTINCT aggregates
    (round-13): the inner block groups by one categorical key and
    computes COUNT(DISTINCT)/SUM(DISTINCT) (Spark's Expand-based
    rewrite); the outer block runs a ROWS-framed window ordered by the
    now-UNIQUE group key over those distinct-aggregate values — the
    stacked rewrite (Expand feeding Window) neither round-11 shape
    (multi-distinct alone, framed windows alone) exercises.
    Deterministic: the frame order key is the group key, unique by
    construction."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    cat = rng.choice([c for c in spec["cat"] if c in CAT_VALUES])
    ic = rng.choice([c for c in spec["int"] if c != cat])
    dkind = rng.choice(["count_d", "sum_d", "count_d_mod"])
    if dkind == "count_d":
        dagg = f"COUNT(DISTINCT {ic})"
    elif dkind == "sum_d":
        dagg = f"CAST(SUM(DISTINCT {ic}) AS BIGINT)"
    else:
        dagg = f"COUNT(DISTINCT {ic} % {rng.randint(2, 7)})"
    inner = f"SELECT {cat} AS k_0, {dagg} AS d_0, COUNT(*) AS c_0 FROM {t}"
    preds = _preds(rng, spec, n_max=1)
    if preds:
        inner += " WHERE " + " AND ".join(preds)
    inner += " GROUP BY " + cat
    n = rng.randint(1, 3)
    frame = rng.choice([
        f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        f"ROWS BETWEEN {n} PRECEDING AND {n} FOLLOWING",
    ])
    wagg = rng.choice(["SUM", "MIN", "MAX", "COUNT"])
    dirn = rng.choice(["ASC", "DESC"])
    w = (f"CAST({wagg}(d_0) OVER (ORDER BY k_0 {dirn} NULLS FIRST "
         f"{frame}) AS BIGINT)")
    return f"SELECT k_0, d_0, c_0, {w} AS w_0 FROM ({inner}) g"


def _gen_string_order_edges(rng: random.Random) -> str:
    """String ordering edges (round-13): both engines default to raw
    codepoint (binary) comparison — uppercase before lowercase, ''
    first, digits before letters — and this generator pins that
    agreement on expression-produced keys where a locale-aware
    collation would sort differently: mixed UPPER/LOWER case keys,
    injected empty strings, tie-heavy SUBSTR prefixes, and
    concatenated multi-part keys. The expression is GROUP BY'd (keys
    become unique, output stays small), then ranked in both directions
    — the rank IS the collation order — alongside global MIN/MAX of
    the key (the other collation-sensitive path)."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    cats = [c for c in spec["cat"]
            if c in CAT_VALUES and isinstance(CAT_VALUES[c][0], str)]
    cat = rng.choice(cats)
    ic = rng.choice(spec["int"])
    kind = rng.choice(["mixed_case", "empty", "prefix", "concat"])
    if kind == "mixed_case":
        expr = (f"CASE WHEN {ic} % 2 = 0 THEN UPPER({cat}) "
                f"ELSE LOWER({cat}) END")
    elif kind == "empty":
        expr = f"CASE WHEN {ic} % {rng.randint(2, 5)} = 0 THEN '' ELSE {cat} END"
    elif kind == "prefix":
        expr = f"SUBSTR({cat}, 1, {rng.randint(1, 3)})"
    else:
        expr = (f"{cat} || '_' || CAST({ic} % {rng.randint(2, 5)} "
                f"AS VARCHAR(10))")
    dirn = rng.choice(["ASC", "DESC"])
    preds = _preds(rng, spec, n_max=1)
    inner = (f"SELECT {expr} AS s_0, COUNT(*) AS c_0, "
             f"CAST(SUM({ic}) AS BIGINT) AS a_0 FROM {t}")
    if preds:
        inner += " WHERE " + " AND ".join(preds)
    inner += " GROUP BY s_0"
    rk = (f"CAST(ROW_NUMBER() OVER (ORDER BY s_0 {dirn} NULLS FIRST) "
          f"AS BIGINT)")
    return (f"SELECT s_0, c_0, a_0, {rk} AS r_0, "
            f"MIN(s_0) OVER () AS lo_0, MAX(s_0) OVER () AS hi_0 "
            f"FROM ({inner}) g")


def _gen_union_coercion(rng: random.Random) -> str:
    """UNION type-coercion corners (round-13): branches deliberately
    disagree on column type so the set op's least-common-type rules
    fire — narrow/wide integer widths (TINYINT..BIGINT; values kept
    provably in range, since ANSI Spark and DuckDB both error on
    overflow), a typed-NULL branch against a concrete type, DECIMAL
    branches with different scales (result re-scaled exactly to
    BIGINT), and INT-vs-DOUBLE mixing consumed only through
    order-insensitive MIN/MAX/COUNT (a cross-engine SUM of doubles
    would compare summation order, not coercion)."""
    kind = rng.choice(["int_widths", "null_branch", "dec_scales",
                       "int_double"])
    if kind == "int_widths":
        narrow = rng.choice([
            "CAST(c_nationkey AS TINYINT) AS v FROM customer",
            "CAST(l_linenumber AS TINYINT) AS v FROM lineitem",
            f"CAST(o_orderkey % {rng.randint(50, 120)} AS SMALLINT) "
            f"AS v FROM orders",
        ])
        wide = rng.choice([
            f"CAST(user_id % {rng.randint(500, 5000)} AS BIGINT) "
            f"AS v FROM events",
            f"CAST(c_custkey % {rng.randint(500, 5000)} AS INT) "
            f"AS v FROM customer",
        ])
        op = rng.choice(["UNION", "UNION ALL"])
        b1, b2 = (narrow, wide) if rng.random() < 0.5 else (wide, narrow)
        return (f"SELECT COUNT(*) AS agg_0, CAST(SUM(v) AS BIGINT) AS agg_1, "
                f"CAST(MIN(v) AS BIGINT) AS agg_2, "
                f"CAST(MAX(v) AS BIGINT) AS agg_3 "
                f"FROM (SELECT {b1} {op} SELECT {b2}) u")
    if kind == "null_branch":
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        ic = rng.choice(spec["int"])
        preds = _preds(rng, spec, n_max=1)
        nb = f"SELECT NULL AS v FROM {t}"
        if preds:
            nb += " WHERE " + " AND ".join(preds)
        cb = f"SELECT {ic} % {rng.randint(5, 50)} AS v FROM {t}"
        op = rng.choice(["UNION", "UNION ALL"])
        b1, b2 = (nb, cb) if rng.random() < 0.5 else (cb, nb)
        return (f"SELECT COUNT(*) AS agg_0, COUNT(v) AS agg_1, "
                f"CAST(MIN(v) AS BIGINT) AS agg_2, "
                f"CAST(MAX(v) AS BIGINT) AS agg_3 "
                f"FROM ({b1} {op} {b2}) u")
    if kind == "dec_scales":
        t = rng.choice([t for t in TABLES if TABLES[t]["cents"]])
        c = rng.choice(TABLES[t]["cents"])
        t2 = rng.choice([t for t in TABLES if TABLES[t]["cents"]])
        c2 = rng.choice(TABLES[t2]["cents"])
        # ROUND the DECIMAL, never the raw double: ROUND(double, 1)
        # diverges at representation edges (Spark rounds the double's
        # exact binary value via BigDecimal HALF_UP, DuckDB scales and
        # rounds in C — first run of this block caught seeds #729/#758
        # drifting by one 0.1-ulp per edge row), which is the double-SUM
        # discipline in another guise, not the coercion under test.
        b1 = f"SELECT CAST({c} AS DECIMAL(18,2)) AS v FROM {t}"
        b2 = (f"SELECT CAST(ROUND(CAST({c2} AS DECIMAL(18,2)) "
              f"* {rng.randint(2, 9)}, 1) AS DECIMAL(12,1)) AS v FROM {t2}")
        op = rng.choice(["UNION", "UNION ALL"])
        return (f"SELECT COUNT(*) AS agg_0, "
                f"CAST(SUM(v * 100) AS BIGINT) AS agg_1, "
                f"CAST(MIN(v * 100) AS BIGINT) AS agg_2, "
                f"CAST(MAX(v * 100) AS BIGINT) AS agg_3 "
                f"FROM ({b1} {op} {b2}) u")
    t = rng.choice([t for t in TABLES if TABLES[t]["cents"]])
    spec = TABLES[t]
    c = rng.choice(spec["cents"])
    ic = rng.choice(spec["int"])
    ib = f"SELECT {ic} % {rng.randint(5, 200)} AS v FROM {t}"
    db = f"SELECT {c} AS v FROM {t}"
    preds = _preds(rng, spec, n_max=1)
    if preds:
        db += " WHERE " + " AND ".join(preds)
    op = rng.choice(["UNION", "UNION ALL"])
    b1, b2 = (ib, db) if rng.random() < 0.5 else (db, ib)
    return (f"SELECT COUNT(*) AS agg_0, "
            f"CAST(ROUND(MIN(v) * 100) AS BIGINT) AS agg_1, "
            f"CAST(ROUND(MAX(v) * 100) AS BIGINT) AS agg_2 "
            f"FROM ({b1} {op} {b2}) u")


def _gen_query_r13(rng: random.Random) -> str:
    """Dispatcher for indexes 700-799 (round-13 widening): ONLY the
    four new shapes, own dispatcher per the frozen-prefix contract."""
    r = rng.random()
    if r < 0.25:
        return _gen_exists_setop(rng)
    if r < 0.50:
        return _gen_window_over_distinct(rng)
    if r < 0.75:
        return _gen_string_order_edges(rng)
    return _gen_union_coercion(rng)


def _gen_query_r12(rng: random.Random) -> str:
    """Dispatcher for indexes 600-699 (round-12 widening): ONLY the
    four new shapes, in a separate dispatcher so the frozen 0-599
    corpus stays byte-identical (the per-index rng contract)."""
    r = rng.random()
    if r < 0.25:
        return _gen_grouping_distinct(rng)
    if r < 0.50:
        return _gen_setop_all(rng)
    if r < 0.75:
        return _gen_decimal_query(rng)
    return _gen_interval_ts_query(rng)


def _gen_query_r11(rng: random.Random) -> str:
    """Dispatcher for indexes 500+ (round-11 widening): ONLY the four
    new shapes — a separate dispatcher because changing _gen_query's
    draw probabilities would regenerate all 500 pre-existing queries
    (the round-10 corpus break this suite promised not to repeat)."""
    r = rng.random()
    if r < 0.25:
        return _gen_qualify_query(rng)
    if r < 0.50:
        return _gen_multi_distinct_agg(rng)
    if r < 0.75:
        return _gen_null_order_window(rng)
    return _gen_filter_agg(rng)


def _gen_query(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.32:
        return _gen_agg_query(rng)
    if r < 0.46:
        return _gen_window_query(rng)
    if r < 0.54:
        return _gen_subquery_query(rng)
    if r < 0.64:
        return _gen_correlated_query(rng)
    if r < 0.72:
        return _gen_grouping_query(rng)
    if r < 0.80:
        return _gen_range_frame_query(rng)
    if r < 0.87:
        return _gen_lateral_query(rng)
    if r < 0.94:
        return _gen_interval_range_query(rng)
    return _gen_setop_subquery(rng)


def _all_queries() -> list[tuple[int, str]]:
    # per-index rng: appending indexes or adding generators that only
    # later indexes draw leaves earlier queries byte-identical. New
    # rounds widen by appending an index block with its OWN dispatcher
    # (round 11: 500-599), never by touching an existing dispatcher.
    return (
        [(i, _gen_query(random.Random(f"{SEED}:{i}")))
         for i in range(N_QUERIES_R10)]
        + [(i, _gen_query_r11(random.Random(f"{SEED}:{i}")))
           for i in range(N_QUERIES_R10, N_QUERIES_R11)]
        + [(i, _gen_query_r12(random.Random(f"{SEED}:{i}")))
           for i in range(N_QUERIES_R11, N_QUERIES_R12)]
        + [(i, _gen_query_r13(random.Random(f"{SEED}:{i}")))
           for i in range(N_QUERIES_R12, N_QUERIES)]
    )


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
