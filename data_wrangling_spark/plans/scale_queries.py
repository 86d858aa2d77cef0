"""Scale-shaped extension queries: multi-join analytics, temporal joins,
sessionization, semi-structured (JSON) extraction, sub-word token costing,
IVF similarity.

These extend the reference's relational surface (SURVEY.md §2.7 names
equi-joins over the FK structure as "the natural extension surface";
§2.10 notes the engine may expose streaming/temporal ops the reference
never needed) toward what a 100 TB training-data pipeline actually runs:
big fact-fact joins with a broadcast dim, event-time logic, and nested
payload parsing. Every numeric aggregate is computed in integer cents on
BOTH engines so the driver's value hash is float-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangling_spark.functions.text import BPE_ISH_PATTERN, bpe_ish_token_count, token_count
from data_wrangling_spark.plans.registry import register
from data_wrangling_spark.plans.seeded_goldens import golden_oracle
from data_wrangling_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _table_disk_bytes(sf_dir: str, name: str) -> int:
    """On-disk parquet size of a table (file or directory) — the cheap,
    estimator-independent input for size-gating a broadcast HINT. A
    hint overrides every Catalyst/AQE threshold, so any hinted relation
    must be provably small from ACTUAL data, not from the join-output
    size estimates the hint exists to correct. Filesystem metadata
    only; no Spark job. Non-local/missing paths return 2**62 (gate
    shut — fall back to the adaptive plan)."""
    import os

    p = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(p):
        return os.path.getsize(p)
    if os.path.isdir(p):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _dirs, files in os.walk(p)
            for f in files
        )
    return 2**62


#: revenue in exact integer cents — ONE definition for every lineitem
#: revenue aggregate in this module (its SQL twin is the literal
#: `CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)`
#: in each oracle). Spark round() is HALF_UP, matching DuckDB ROUND.
def _revenue_cents() -> Column:
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")


_Q3_DATE = "1998-06-15"


@register(
    "ext_tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
          AND l_shipdate  > TIMESTAMP '{_Q3_DATE}'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3-shaped multi-join, largest-table-major: the filtered "
        "customer dim broadcasts into orders (explicit hint — always "
        "tiny), and lineitem streams against the orders⨝customer result "
        "with NO forced strategy: Catalyst broadcasts it at bench scale, "
        "AQE switches to a shuffle join when it outgrows the threshold "
        "at 100 TB. Measured 1.8x faster than the orders-major order, "
        "which made Catalyst broadcast the big filtered lineitem side. "
        "Revenue in int cents on both engines.",
    bench=True,
)
def ext_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp"))
    rev_cents = _revenue_cents()
    oc = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev_cents) / F.lit(100.0)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "ext_asof_latest_order",
    oracle="""
        WITH ord AS (
            SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS last_orderkey
        FROM events e
        ASOF LEFT JOIN ord o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    doc="As-of (temporal) join: each event gets the user's most recent "
        "order at-or-before its timestamp; (custkey, date) ties resolve "
        "to the max orderkey via the operator's right_tiebreak, which "
        "folds the dedup into the carry window's sort instead of a "
        "groupBy pre-pass — the whole query is ONE hash shuffle on the "
        "key, no range cross-product, no aggregate exchange "
        "(operators/temporal.py). Oracle uses DuckDB's native ASOF LEFT "
        "JOIN over the max-orderkey dedup, which is equivalent.",
    bench=True,
)
def ext_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.temporal import asof_join

    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    # no final global orderBy: the driver canonicalizes by sorting rows
    # anyway, and the sort was ~1/3 of this query's bench wall time;
    # event_id is a deterministic key so the SET of rows is stable
    return asof_join(
        events, orders, on="user_id", left_time="ts", right_time="o_orderdate",
        payload={"o_orderkey": "last_orderkey"}, right_tiebreak="o_orderkey",
    )


@register(
    "ext_asof_first_event",
    oracle="""
        WITH ev AS (
            SELECT user_id, ts, min(event_id) AS event_id
            FROM events GROUP BY 1, 2
        )
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
               e.event_id AS first_event_id
        FROM orders o
        ASOF LEFT JOIN ev e
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ORDER BY o.o_orderkey
    """,
    doc="Forward as-of join: each order gets the customer's EARLIEST "
        "event at-or-after the order date (right side deduplicated per "
        "(user, ts) by min event_id for determinism). Mirror of the "
        "backward direction — same single hash shuffle, carry window "
        "reversed (operators/temporal.py).",
)
def ext_asof_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.temporal import asof_join

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("event_id"))
        .select(F.col("user_id").alias("o_custkey"), "ts", "event_id")
    )
    out = asof_join(
        orders, events, on="o_custkey", left_time="o_orderdate", right_time="ts",
        payload={"event_id": "first_event_id"}, direction="forward",
    )
    return out.orderBy("o_orderkey")


@register(
    "ext_asof_latest_order_bucketed",
    oracle="""
        WITH ord AS (
            SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS last_orderkey
        FROM events e
        ASOF LEFT JOIN ord o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    doc="ext_asof_latest_order through the SKEW-SAFE bucketed form: same "
        "result (same oracle), but the carry window partitions on "
        "(user, weekly time bucket) instead of user alone, so a hot "
        "key's rows spread across its buckets and only one pre-"
        "aggregated payload row per (key, bucket) crosses boundaries — "
        "the mitigation for the one skew shape AQE cannot split "
        "(window partitions). operators/temporal.py asof_join_bucketed.",
)
def ext_asof_latest_order_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.temporal import asof_join_bucketed

    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    return asof_join_bucketed(
        events, orders, on="user_id", left_time="ts", right_time="o_orderdate",
        payload={"o_orderkey": "last_orderkey"}, bucket_seconds=7 * 86400,
        right_tiebreak="o_orderkey",
    )


@register(
    "ext_asof_latest_order_adaptive",
    oracle="""
        WITH ord AS (
            SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS last_orderkey
        FROM events e
        ASOF LEFT JOIN ord o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    doc="ext_asof_latest_order through the ADAPTIVE form — the "
        "recommended default at scale: one hash-bucket counting job "
        "(bucket cardinality caps the partial-agg output per task, so "
        "the detection shuffle is O(buckets) at any data size) collects "
        "the heavy-bucket ids as control-plane rows, and ONE carry "
        "window runs on (key, weekly bucket) for keys in those buckets "
        "— routed by a literal isin predicate, no broadcast join — and "
        "(key, 0) for everything else. With no heavy bucket the "
        "returned plan IS plain asof_join's verbatim (plan-pinned), so "
        "the uniform-key cost over plain is exactly the detection job "
        "(r7: 1.21x at 20x, ~1.0x at 100x; the earlier lazy/AQE-"
        "erasure form left ~0.6s of inert machinery). Same oracle as "
        "the plain/bucketed forms (result-identical by construction). "
        "heavy_threshold (50k) and detection_buckets (4096) are "
        "bench-sized the same way SCALING.md's skew section shrinks "
        "the AQE thresholds to GB scale. "
        "operators/temporal.py asof_join_adaptive.",
)
def ext_asof_latest_order_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.temporal import asof_join_adaptive

    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    return asof_join_adaptive(
        events, orders, on="user_id", left_time="ts", right_time="o_orderdate",
        payload={"o_orderkey": "last_orderkey"}, bucket_seconds=7 * 86400,
        right_tiebreak="o_orderkey", heavy_threshold=50_000,
        detection_buckets=4096,
    )


@register(
    "x_text_bm25_search",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents WHERE text IS NOT NULL
        ), dl AS (
            SELECT doc_id, len(t) AS dl, t FROM toks
        ), stats AS (
            SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl
        ), hits AS (
            SELECT doc_id, dl,
                   unnest(list_filter(t,
                       x -> x IN ('spark', 'table', 'filter'))) AS term
            FROM dl
        ), tf AS (
            SELECT doc_id, dl, term, COUNT(*) AS tf
            FROM hits GROUP BY 1, 2, 3
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), scored AS (
            SELECT doc_id,
                   ROUND(SUM(
                       ln(1 + (n - df + 0.5) / (df + 0.5))
                       * tf * (1.2 + 1)
                         / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                   ), 6) AS score
            FROM tf JOIN dfreq USING (term), stats
            GROUP BY doc_id
        )
        SELECT doc_id, score,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                    AS INT) AS rank
        FROM scored QUALIFY rank <= 20 ORDER BY rank
    """,
    doc="Okapi BM25 top-20 lexical retrieval for a 3-term query "
        "(operators/text_analysis.py bm25_topk) — decontamination "
        "lookups / hard-negative mining. Token arrays are filtered to "
        "the query terms BEFORE the explode (no full posting list); tf "
        "aggregates with map-side partials; df (<= |query| rows) and "
        "the 1-row (N, avgdl) stats join back by broadcast. All float "
        "inputs are integer-derived, scores round to 6dp on BOTH "
        "engines and the rank is computed on the rounded score with a "
        "doc_id tiebreak, so library-ulp ln differences cannot flip "
        "ranks.",
)
def x_text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(
        docs, query_terms=["spark", "table", "filter"], top=20
    )


@register(
    "ext_rolling_event_features",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
               CAST(SUM(value_cents) OVER w AS BIGINT) AS sum_7d_cents
        FROM (
            SELECT event_id, user_id, ts,
                   CAST(ROUND(value * 100) AS BIGINT) AS value_cents
            FROM events WHERE ts IS NOT NULL
        )
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL '7 days' PRECEDING
                           AND CURRENT ROW)
    """,
    doc="Trailing-window feature engineering (operators/temporal.py "
        "trailing_window_features): per event, the user's event count "
        "and exact cents spend over the trailing 7 days — ONE RangeFrame "
        "window ordered by integer epoch micros (exact interval bound; "
        "no self-join, no per-row rescan: Spark's range evaluator "
        "slides both bounds monotonically). The only exchange is the "
        "per-user hash partition. Round 13: the terminal "
        "orderBy(event_id) was a presentation sort — an EVENT-scale "
        "range exchange whose sampling pass re-executed the window "
        "upstream (the round-12 snapshot_diff find); dropped on BOTH "
        "engines (driver value-hash sorts rows, so the result is "
        "unchanged): 4.20s -> 2.94s solo at 100x "
        "(scripts/bench_rolling_ab.py).",
)
def ext_rolling_event_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.temporal import (
        trailing_window_features,
    )

    events = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("value_cents"),
    )
    out = trailing_window_features(
        events, on="user_id", time_col="ts", window_seconds=7 * 86400,
        # plain aggregates only: .over() must wrap the aggregate itself
        # (cast(sum(x)).over(w) is MISSING_GROUP_BY); Spark SUM(BIGINT)
        # is already bigint, the oracle casts DuckDB's HUGEINT back
        exprs={
            "n_7d": F.count(F.lit(1)),
            "sum_7d_cents": F.sum("value_cents"),
        },
    )
    return out.select(
        "event_id", "user_id", "ts", "n_7d", "sum_7d_cents"
    )


@register(
    "ext_sessionize_events",
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts,
                   CAST(SUM(new_s) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_no
            FROM flagged
        )
        SELECT user_id, session_no, COUNT(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM sess GROUP BY user_id, session_no
        ORDER BY user_id, session_no
    """,
    doc="Gap-based sessionization (30-min gap): lag + conditional "
        "cumulative sum per user, then per-session aggregates. Batch twin "
        "of streaming session windows; one shuffle on user_id "
        "(operators/temporal.py).",
)
def ext_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.temporal import sessionize

    events = _t(spark, sf_dir, "events")
    out = sessionize(events, key="user_id", ts="ts", gap_minutes=30,
                     order_tiebreak="event_id")
    return out.select("user_id", "session_no", "n_events",
                      "session_start", "session_end").orderBy("user_id", "session_no")


@register(
    "ext_json_extract_agg",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0
                   AS sum_value
        FROM events
        GROUP BY 1 ORDER BY prop_k
    """,
    doc="Semi-structured extraction: parse the JSON props payload "
        "JVM-side (get_json_object), aggregate by the extracted field. "
        "At scale prefer from_json with an explicit schema once the "
        "payload shape is known (single parse, pruned struct).",
)
def ext_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("int").alias("prop_k"), "value"
        )
        .groupBy("prop_k")
        .agg(F.count("*").alias("cnt"), (F.sum(cents) / F.lit(100.0)).alias("sum_value"))
        .orderBy("prop_k")
    )


@register(
    "x_text_bpe_tokens",
    oracle=rf"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS INT)
                   AS n_bpe_tokens,
               CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
                   AS n_ws_tokens
        FROM documents ORDER BY doc_id
    """,
    doc="X-TEXT token costing: BPE-ish pre-tokenizer count (GPT-2-style "
        "split, letters/digits/symbols with optional leading space) next "
        "to the whitespace count — both pure JVM regex, no UDF.",
)
def x_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        bpe_ish_token_count("text").cast("int").alias("n_bpe_tokens"),
        token_count("text").cast("int").alias("n_ws_tokens"),
    ).orderBy("doc_id")


@register(
    "x_multimodal_frames",
    # the mapInPandas fan-out IS oracle-able: the stub resize
    # (cycle-pad to 512 bytes) and 64-byte frame chunking are byte
    # arithmetic DuckDB can replay in hex space (no BLOB substring in
    # DuckDB, so both engines compare uppercase hex — 2 chars per byte).
    # Byte-exactness also pinned in tests/test_multimodal.py.
    oracle="""
        WITH resized AS (
            SELECT doc_id,
                   substring(repeat(hex(encode(text)),
                                    CAST(ceil(512.0 / octet_length(encode(text)))
                                         AS INT)),
                             1, 1024) AS rp_hex
            FROM documents
        )
        SELECT doc_id AS media_id, f.idx AS frame_idx,
               substring(rp_hex, f.idx * 128 + 1, 128) AS frame_hex
        FROM resized, (VALUES (0), (4)) f(idx)
        ORDER BY media_id, frame_idx
    """,
    doc="X-MULTIMODAL pipeline composition: resize (schema-preserving "
        "mapInPandas) → frame sampling (1→N Arrow fan-out). Decode/"
        "resize are deterministic stubs (codecs absent here); the Spark "
        "plumbing — binary columns, batch shapes, UDTF-style expansion — "
        "is real. Frame bytes projected as hex for the driver hash "
        "(binary cells canonicalize differently across engines); library "
        "callers get the typed binary from sample_frames directly.",
)
def x_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.multimodal import (
        resize_media,
        sample_frames,
        synth_media_from_documents,
    )

    docs = _t(spark, sf_dir, "documents")
    media = resize_media(synth_media_from_documents(docs), width=64, height=8)
    return (
        sample_frames(media, frame_bytes=64, every_n=4)
        .select("media_id", "frame_idx", F.hex("frame_payload").alias("frame_hex"))
        .orderBy("media_id", "frame_idx")
    )


@register(
    "ext_percentiles",
    oracle="""
        SELECT o_orderstatus AS status,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95,
               COUNT(*) AS cnt
        FROM orders GROUP BY o_orderstatus ORDER BY status
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` == "
        "DuckDB `quantile_cont`, both linear interpolation; rounded 4dp "
        "against ulp drift). SCALE NOTE: exact `percentile` buffers "
        "every group member in one aggregation buffer — at scale use "
        "ext_percentiles_scalable (exact, histogram-refinement "
        "boundaries) or approx_percentile (t-digest, engine-specific "
        "values).",
)
def ext_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
            F.count("*").alias("cnt"),
        )
        .orderBy("status")
    )


@register(
    "ext_percentiles_scalable",
    oracle="""
        WITH c AS (
            SELECT o_orderstatus AS status,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), b AS (
            SELECT status,
                   ROUND(quantile_cont(cents, 0.5), 4) AS p50_cents,
                   ROUND(quantile_cont(cents, 0.95), 4) AS p95_cents
            FROM c GROUP BY status
        )
        SELECT c.status, b.p50_cents, b.p95_cents,
               COUNT(*) AS cnt,
               CAST(SUM(CASE WHEN c.cents <= b.p50_cents THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_le_p50,
               CAST(SUM(CASE WHEN c.cents <= b.p95_cents THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_le_p95
        FROM c JOIN b USING (status)
        GROUP BY c.status, b.p50_cents, b.p95_cents
        ORDER BY status
    """,
    doc="SCALABLE grouped exact percentiles — upgrades ext_percentiles' "
        "documented weakness (exact `percentile` per group buffers every "
        "group member in one aggregation buffer; its honest scale path "
        "was approx_percentile, which breaks oracle parity). Boundaries "
        "come from operators.quantiles.exact_quantiles_grouped: ONE "
        "distributed histogram job per refinement level covering ALL "
        "groups (data equi-joins a broadcast interval table - "
        "BroadcastHashJoin, no nested loop), O(groups x strata) "
        "control-plane collects, constant-size aggregate buffers. The "
        "final pass is distributed: each row bands against its group's "
        "literal cut points (broadcast 3-row boundary table) and "
        "per-group counts below each boundary are aggregated - same "
        "DuckDB quantile_cont oracle, exact int-cent arithmetic. Builds "
        "eagerly (boundary jobs at plan-build time).",
)
def ext_percentiles_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.quantiles import (
        _round_half_up,
        exact_quantiles_grouped,
    )

    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    c = orders.select(
        F.col("o_orderstatus").alias("status"), cents.alias("cents")
    )
    qs = exact_quantiles_grouped(c, "status", "cents", [0.5, 0.95])
    bounds = spark.createDataFrame(
        [
            (g, _round_half_up(v[0], 4), _round_half_up(v[1], 4))
            for g, v in sorted(qs.items())
        ],
        "status string, p50_cents double, p95_cents double",
    )
    return (
        c.join(F.broadcast(bounds), "status")
        .groupBy("status", "p50_cents", "p95_cents")
        .agg(
            F.count("*").alias("cnt"),
            F.sum((F.col("cents") <= F.col("p50_cents")).cast("bigint"))
            .alias("n_le_p50"),
            F.sum((F.col("cents") <= F.col("p95_cents")).cast("bigint"))
            .alias("n_le_p95"),
        )
        .orderBy("status")
    )


@register(
    "ext_dataset_split",
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                        AS INTEGER) AS bucket
            FROM documents
        )
        SELECT doc_id, bucket,
               CASE WHEN bucket < 52429 THEN 'train'
                    WHEN bucket < 58982 THEN 'val'
                    ELSE 'test' END AS split
        FROM b ORDER BY doc_id
    """,
    doc="Deterministic train/val/test split (80/10/10) by content-keyed "
        "hash bucket — stable under reprocessing and appends, unlike "
        "randomSplit whose assignment depends on partitioning. The md5 "
        "bucket function is engine-portable, so the SAME rows land in "
        "the SAME split on Spark and DuckDB (operators/splits.py).",
)
def ext_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.splits import dataset_split

    docs = _t(spark, sf_dir, "documents")
    out = dataset_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return out.select("doc_id", "bucket", "split").orderBy("doc_id")


@register(
    "x_text_sequence_pack",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS INT)
                       AS n_tokens
            FROM documents
        ), packed AS (
            SELECT doc_id, n_tokens,
                   CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_tokens
            FROM toks
        )
        SELECT doc_id, n_tokens,
               CAST(floor((cum_tokens - n_tokens) / 2048.0) AS BIGINT) AS pack_id
        FROM packed ORDER BY doc_id
    """,
    doc="Sequence packing for LLM training batches: docs in stable id "
        "order are assigned to fixed token-budget packs (2048) by "
        "running-sum bucketing — the deterministic, shuffle-light "
        "approximation of greedy bin packing (a doc starts the pack its "
        "cumulative predecessor count falls in). The running sum is the "
        "two-pass distributed prefix sum (operators/prefix.py): id-range "
        "partition totals → O(n_ranges) control-plane collect → offsets "
        "spliced into per-range cumulative windows — the cumsum never "
        "serializes through one task (the naive global ORDER BY window "
        "was the round-7 verdict's last scale-killer; a dedicated plan "
        "test now pins no Exchange SinglePartition). EAGER at build "
        "(two tiny control aggregates), like the exact_quantiles family.",
)
def x_text_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.prefix import prefix_sum

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", bpe_ish_token_count("text").cast("int").alias("n_tokens"))
    return (
        prefix_sum(toks, "doc_id", "n_tokens", out_col="cum_tokens")
        .select(
            "doc_id",
            "n_tokens",
            # explicit floor: DuckDB's double->bigint CAST rounds to
            # nearest while Spark's truncates — floor() agrees everywhere
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(2048.0))
            .cast("bigint")
            .alias("pack_id"),
        )
        .orderBy("doc_id")
    )


@register(
    "x_text_decontaminate",
    oracle=r"""
        WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents
        ), grams AS (
            SELECT doc_id, unnest(list_distinct(
                list_transform(range(1, greatest(len(toks) - 3, 1)),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                    || ' ' || toks[i+3] || ' ' || toks[i+4])
            )) AS gram
            FROM tok WHERE len(toks) >= 5
        ), eval_grams AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id < 10
        ), hits AS (
            SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared
            FROM grams g JOIN eval_grams e ON g.gram = e.gram
            WHERE g.doc_id >= 10
            GROUP BY g.doc_id
        )
        SELECT doc_id, n_shared FROM hits ORDER BY doc_id
    """,
    doc="Benchmark decontamination: flag training docs sharing any "
        "5-gram with the eval set (docs 0-9 stand in) via a shingle "
        "inverted-index join — the standard leakage check before "
        "training. Eval grams broadcast (eval sets are small); corpus "
        "side is one scan + explode, no n² comparison.",
)
def x_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.dedup import shingles

    docs = _t(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(shingles("text", n=5)).alias("gram")
    )
    eval_grams = grams.filter(F.col("doc_id") < 10).select("gram").distinct()
    return (
        grams.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared"))
        .orderBy("doc_id")
    )


@register(
    "x_vec_normalize",
    oracle="""
        WITH s AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[])) AS n
            FROM embeddings
        )
        SELECT vec_id,
               printf('%.6f', ROUND(n, 6)) AS norm,
               array_to_string(
                   list_transform(v, x -> printf('%.6f', ROUND(x / n, 6))),
                   ',') AS unit
        FROM s ORDER BY vec_id
    """,
    doc="Vector transform surface: L2-normalize embedding columns with "
        "built-in higher-order functions (transform + aggregate) — the "
        "standard pre-processing before cosine reduces to dot product. "
        "Rounded 6dp then fixed-format printed on BOTH engines and "
        "joined to one comma-separated string, because the driver's "
        "value-hash canonicalizer cannot hash raw arrays; narrow, no "
        "shuffle either way.",
)
def x_vec_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.functions.vectors import norm

    emb = _t(spark, sf_dir, "embeddings")
    # norm projected ONCE, then referenced — inlining it would re-run
    # the O(d) sum-of-squares per ELEMENT inside the transform lambda
    # (O(d^2) per vector; the same hazard x_vec_quantize documents).
    # CRITICAL (review find): CollapseProject inlines a SINGLE-use
    # non-cheap alias right back into the lambda, silently undoing the
    # pre-projection — `_n` must be referenced at least twice to
    # survive, which the extra `norm` output column provides (verified
    # against the optimized plan in tests/test_plan_hygiene.py).
    based = emb.select("vec_id", "embedding", norm("embedding").alias("_n"))
    unit = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.format_string("%.6f", F.round(x / F.col("_n"), 6)),
    )
    # norm printf-fixed like the unit elements (review find: a raw
    # ROUND-ed double is compared repr-exact by the driver, and
    # Spark/DuckDB HALF_UP can disagree near .5e-6 boundaries — the
    # same hazard the unit column always formatted away)
    return based.select(
        "vec_id",
        F.format_string("%.6f", F.round(F.col("_n"), 6)).alias("norm"),
        F.concat_ws(",", unit).alias("unit"),
    ).orderBy("vec_id")


@register(
    "x_vec_quantize",
    oracle="""
        WITH s AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   NULLIF(list_max(list_transform(embedding::DOUBLE[],
                                                  x -> abs(x))), 0)
                       / 127.0 AS scale
            FROM embeddings
        )
        SELECT vec_id,
               ROUND(scale, 6) AS scale,
               array_to_string(
                   list_transform(v, x -> CAST(ROUND(x / scale) AS INT)),
                   ',') AS q
        FROM s ORDER BY vec_id
    """,
    doc="Symmetric int8 embedding quantization (functions/vectors.py): "
        "per-vector scale = max|x|/127, q = round(x/scale) — the 4x "
        "storage/bandwidth cut ANN serving applies before shipping "
        "vectors. Pure higher-order JVM expressions, narrow, no "
        "shuffle; int components joined to a string for the driver's "
        "hasher, scale rounded 6dp on both engines.",
)
def x_vec_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.functions.vectors import quantize_int8, quantize_scale

    emb = _t(spark, sf_dir, "embeddings")
    # scale projected ONCE, then referenced — inlining it would re-run
    # the array_max per element inside the transform lambda (O(d^2))
    scaled = emb.select(
        "vec_id", "embedding", quantize_scale("embedding").alias("s")
    )
    q_str = F.concat_ws(",", quantize_int8("embedding", F.col("s")))
    return scaled.select(
        "vec_id",
        F.round("s", 6).alias("scale"),
        # zero-vector guard: concat_ws over an all-NULL array gives ''
        # but DuckDB's array_to_string gives NULL — emit NULL on both
        F.when(F.col("s").isNull(), F.lit(None)).otherwise(q_str).alias("q"),
    ).orderBy("vec_id")


@register(
    "ext_parts_revenue_by_brand",
    oracle="""
        SELECT p_brand AS brand,
               COUNT(DISTINCT p.p_partkey) AS n_parts,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) / 100.0 AS revenue
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_size <= 15
        GROUP BY p_brand
        ORDER BY revenue DESC, brand
    """,
    doc="Part-dimension join (completes query coverage of every driver "
        "table): small-part revenue by brand — filtered part dim "
        "broadcast into the lineitem fact, int-cents revenue, "
        "distinct-part count per brand.",
)
def ext_parts_revenue_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    li = _t(spark, sf_dir, "lineitem")
    rev_cents = _revenue_cents()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.countDistinct("p_partkey").alias("n_parts"),
            (F.sum(rev_cents) / F.lit(100.0)).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "brand")
    )


@register(
    "ext_scd2_intervals",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderpriority AS state,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)
                   AS valid_to
        FROM orders
        ORDER BY o_custkey, valid_from, o_orderkey
    """,
    doc="SCD type-2 interval construction: each change row gets "
        "[valid_from, valid_to) with valid_to = the key's next change "
        "(NULL = current) via lead() — the standard warehouse history "
        "build, one shuffle on the entity key, deterministic tiebreak.",
)
def ext_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderpriority").alias("state"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    ).orderBy("o_custkey", "valid_from", "o_orderkey")


@register(
    "ext_argmax_agg",
    oracle="""
        SELECT o_orderstatus AS status,
               max_by(o_custkey, o_orderkey) AS last_custkey,
               min_by(o_custkey, o_orderkey) AS first_custkey,
               max(o_orderkey) AS max_orderkey
        FROM orders GROUP BY o_orderstatus ORDER BY status
    """,
    doc="Argmax/argmin aggregates (max_by/min_by — same semantics both "
        "engines): the customer of each status's highest/lowest order "
        "key. Keyed on the UNIQUE orderkey so ties cannot make the "
        "result nondeterministic.",
)
def ext_argmax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.max_by("o_custkey", "o_orderkey").alias("last_custkey"),
            F.min_by("o_custkey", "o_orderkey").alias("first_custkey"),
            F.max("o_orderkey").alias("max_orderkey"),
        )
        .orderBy("status")
    )


@register(
    "ext_date_dim",
    oracle="""
        SELECT strftime(CAST(d AS DATE), '%Y-%m-%d') AS d,
               CAST(year(d) AS INT) AS y,
               CAST(quarter(d) AS INT) AS q,
               CAST(month(d) AS INT) AS m,
               CAST(dayofweek(d) AS INT) AS dow,
               dayofweek(d) IN (0, 6) AS is_weekend
        FROM generate_series(DATE '1995-01-01', DATE '1995-12-31',
                             INTERVAL 1 DAY) AS t(d)
        ORDER BY d
    """,
    doc="Generated source (no input table): a date dimension built with "
        "sequence + explode — the standard pattern for calendar/spine "
        "tables joined against facts. dow normalized to DuckDB's "
        "0=Sunday convention (Spark's dayofweek is 1=Sunday). The date "
        "key is emitted as an ISO yyyy-MM-dd string on both engines: "
        "Spark DATE and DuckDB generate_series dates land as different "
        "pandas dtypes (datetime.date vs datetime64) at the compare "
        "boundary.",
)
def ext_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-12-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )
    dow = (F.dayofweek("d") - 1).cast("int")
    return days.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        F.year("d").cast("int").alias("y"),
        F.quarter("d").cast("int").alias("q"),
        F.month("d").cast("int").alias("m"),
        dow.alias("dow"),
        dow.isin(0, 6).alias("is_weekend"),
    ).orderBy("d")


@register(
    "ext_stats_agg",
    oracle="""
        SELECT l_returnflag AS flag,
               ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               ROUND(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
        FROM lineitem GROUP BY l_returnflag ORDER BY flag
    """,
    doc="Statistical aggregates (stddev/corr/covar — identical "
        "definitions in Spark and DuckDB, rounded 6dp against "
        "accumulation-order ulps): single hash aggregate with map-side "
        "partials; the moments are mergeable, so this scales like any "
        "sum.",
)
def ext_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
        )
        .orderBy("flag")
    )


def _hll_weekly_oracle() -> str:
    from data_wrangling_spark.operators.sketches import (
        hll_estimate_sql,
        hll_sql,
    )

    bucket, rho = hll_sql("user_id")
    regs = f"""(
        SELECT CAST(weekofyear(ts) AS INT) AS week,
               {bucket} AS bucket, MAX({rho}) AS rho_max
        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
    )"""
    est = hll_estimate_sql(regs, "week")
    return f"""
        WITH est AS ({est}), exact AS (
            SELECT CAST(weekofyear(ts) AS INT) AS week,
                   COUNT(DISTINCT user_id) AS exact_users
            FROM events GROUP BY 1
        )
        SELECT est.week, est.approx_distinct AS approx_users,
               exact.exact_users
        FROM est JOIN exact ON est.week = exact.week
        ORDER BY est.week
    """


@register(
    "x_sketch_hll_weekly_users",
    # FULL independent SQL re-derivation (round-7: replaces the pinned-
    # snapshot golden — the sketch family now carries zero engine-
    # snapshot oracles): the engine-portable HLL's hash, registers, and
    # estimate are all *, %, xor, >>, bin-string, one division, and one
    # ln over exact integers, so DuckDB replays every register AND the
    # estimate bit-exactly (operators/sketches.py module notes). The
    # oracle derives WEEKLY registers directly — exactly equal to the
    # query's daily-then-merge because register merge is max.
    oracle=_hll_weekly_oracle(),
    doc="Mergeable-sketch distinct counting: per-DAY HLL register "
        "tables of user_id (one pass over events, <= 4096 rows per "
        "day), then weekly uniques by MERGING the daily registers "
        "(max) — no second pass over raw data. THE pattern for "
        "distinct-count rollups at 100 TB: sketches are tiny, "
        "mergeable across partitions/days/clusters, and reusable for "
        "any coarser rollup. The engine-portable implementation "
        "(operators/sketches.py hll_registers/hll_merge/hll_estimate) "
        "keeps ~1.6% RSE at p=12 (bounded at 5% by pytest + the "
        "x_sketch_hll_bound oracle) while every step replays in ANSI "
        "SQL. Returns (week, approx_users, exact_users) so the "
        "estimate quality is visible.",
)
def x_sketch_hll_weekly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    events = _t(spark, sf_dir, "events")
    ev = events.select(
        F.to_date("ts").alias("day"),
        F.weekofyear(F.col("ts")).alias("week"),
        "user_id",
    )
    daily = hll_registers(ev, "user_id", ["week", "day"])
    weekly = hll_merge(daily, ["week"])
    weekly_approx = hll_estimate(weekly, ["week"], out_col="approx_users")
    weekly_exact = ev.groupBy("week").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        weekly_approx.join(weekly_exact, "week")
        .select("week", "approx_users", "exact_users")
        .orderBy("week")
    )


@register(
    "x_sketch_hll_bound",
    oracle="""
        SELECT CAST(weekofyear(ts) AS INT) AS week,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS within_bound
        FROM events GROUP BY 1 ORDER BY week
    """,
    doc="Sketch-family's second ORACLED row (round-2 verdict item 9): the "
        "HLL estimate itself is engine-specific, but its ERROR BOUND is "
        "not — within_bound asserts |approx - exact| / exact <= 5% (Spark "
        "hll_sketch_agg default lgConfigK=12 => ~1.6% RSE; 5% is 3 sigma). "
        "The oracle expects within_bound = TRUE for every week, so a "
        "sketch regression flips the hash. Same mergeable per-day -> "
        "weekly-union rollup as x_sketch_hll_weekly_users.",
)
def x_sketch_hll_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    weekly = x_sketch_hll_weekly_users(spark, sf_dir)
    rel_err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users")
    return weekly.select(
        "week",
        "exact_users",
        (rel_err <= F.lit(0.05)).alias("within_bound"),
    ).orderBy("week")


def _countmin_oracle() -> str:
    from data_wrangling_spark.operators.sketches import bucket_sql

    h = bucket_sql("user_id", "i", 64)
    return f"""
        WITH cells AS (
            SELECT i, {h} AS bucket, COUNT(*) AS cnt
            FROM events, range(4) t(i) GROUP BY 1, 2
        ), truec AS (
            SELECT user_id, COUNT(*) AS true_cnt FROM events GROUP BY 1
        ), probes AS (
            SELECT user_id, i, {h} AS bucket
            FROM (SELECT DISTINCT user_id FROM events), range(4) t(i)
        ), est AS (
            SELECT p.user_id, MIN(c.cnt) AS est
            FROM probes p JOIN cells c ON c.i = p.i AND c.bucket = p.bucket
            GROUP BY 1
        ), total AS (SELECT COUNT(*) AS n FROM events)
        SELECT e.user_id, CAST(e.est AS BIGINT) AS est, t.true_cnt
        FROM est e JOIN truec t USING (user_id), total
        WHERE e.est >= 0.01 * total.n
        ORDER BY e.user_id
    """


@register(
    "x_sketch_countmin_heavy_hitters",
    oracle=_countmin_oracle(),
    doc="Count-min sketch heavy hitters: 4×64 counter grid over "
        "events.user_id (one explode + one bounded hash agg, mergeable "
        "by cell-sum like the HLL rollup), estimate = min over the "
        "key's 4 cells, keep keys whose ESTIMATE ≥ 1% of the stream. "
        "true_cnt is carried alongside so the one-sided error "
        "(est ≥ true, never under) is visible in the output. The hash "
        "is portable BIGINT arithmetic, so the DuckDB oracle checks the "
        "sketch CONTENTS exactly, not just error bounds "
        "(operators/sketches.py).",
)
def x_sketch_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    ev = _t(spark, sf_dir, "events").select("user_id")
    sketch = countmin_sketch(ev, "user_id", depth=4, width=64)
    truec = ev.groupBy("user_id").agg(F.count("*").alias("true_cnt"))
    est = countmin_estimate(sketch, truec.select("user_id"), "user_id", depth=4, width=64)
    total = ev.agg(F.count("*").alias("n"))
    return (
        est.join(truec, "user_id")
        .crossJoin(F.broadcast(total))
        .filter(F.col("est") >= 0.01 * F.col("n"))
        .select("user_id", F.col("est").cast("bigint").alias("est"), "true_cnt")
        .orderBy("user_id")
    )


@register(
    "ext_fuzzy_join_levenshtein",
    oracle="""
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
               a.p_name AS txt_a, b.p_name AS txt_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS distance
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 2
        ORDER BY id_a, id_b
    """,
    doc="Blocked fuzzy self-join (entity resolution): part names within "
        "2 edits, candidate pairs generated only inside a p_brand block "
        "— sum(block²) comparisons instead of n², co-partitioned on the "
        "block key; Spark's thresholded levenshtein short-circuits the "
        "DP per pair (operators/fuzzy.py). Cross-brand near-dups are a "
        "documented blocking recall trade-off.",
)
def ext_fuzzy_join_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.fuzzy import fuzzy_self_join

    part = _t(spark, sf_dir, "part")
    out = fuzzy_self_join(
        part, id_col="p_partkey", text_col="p_name", block_col="p_brand",
        max_distance=2,
    )
    return out.select(
        "id_a", "id_b", "txt_a", "txt_b", F.col("distance").cast("int").alias("distance")
    ).orderBy("id_a", "id_b")


@register(
    "x_sim_topk_mllib_brp",
    oracle=golden_oracle("x_sim_topk_mllib_brp"),  # pinned-snapshot
        # golden (seeded BRP model is deterministic); agreement with
                  # cosine brute force is pinned in tests/test_similarity.py
    doc="X-SIM-SEARCH cross-check path: MLlib BucketedRandomProjection"
        "LSH (Euclidean p-stable hashing, seeded) → approxSimilarityJoin "
        "→ per-query top-k re-rank. A second, independently-maintained "
        "LSH implementation beside the hand-rolled hyperplane one; on "
        "this unit-norm corpus its ranking coincides with cosine.",
)
def x_sim_topk_mllib_brp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.similarity import topk_mllib_brp

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = topk_mllib_brp(emb, q, k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("distance", 6).alias("distance"), "rank"
    ).orderBy("query_id", "rank")


@register(
    "ext_stratified_sample",
    oracle="""
        WITH b AS (
            SELECT doc_id, lang,
                   CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)
                                                   || ':sample'), 1, 4))
                        AS INTEGER) AS bucket
            FROM documents
        )
        SELECT doc_id, lang FROM b
        WHERE bucket < CASE WHEN lang = 'en' THEN 13107 ELSE 52429 END
        ORDER BY doc_id
    """,
    doc="Deterministic stratified sampling: downsample the dominant "
        "language (en 20%, others 80%) by a ':sample'-salted portable "
        "hash bucket — reproducible under reprocessing/appends where "
        "df.sample shifts with partitioning, nested (a smaller rate's "
        "sample subsets a larger one's), and independent of the dataset "
        "split's unsalted bucket.",
)
def ext_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.splits import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    out = stratified_sample(docs, "doc_id", "lang", {"en": 0.2}, default_rate=0.8)
    return out.select("doc_id", "lang").orderBy("doc_id")


@register(
    "ext_skew_salted_distinct",
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Skew-safe exact distinct count: salt by hash(user_id) % 32 so a "
        "hot event_type's distinct-user state spreads over 32 reducers; "
        "disjoint bucket counts sum exactly (operators/skew.py). Oracle "
        "is the plain one-stage COUNT(DISTINCT) — results must be "
        "identical, only the physical distribution differs.",
)
def ext_skew_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.skew import salted_distinct_count

    events = _t(spark, sf_dir, "events")
    return salted_distinct_count(events, "event_type", "user_id", buckets=32).orderBy(
        "event_type"
    )


@register(
    "ext_tpch_q5_local_supplier",
    oracle="""
        SELECT n_name AS nation,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) / 100.0 AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, nation
    """,
    doc="TPC-H Q5-shaped 6-table join (local-supplier revenue by nation): "
        "region/nation broadcast into supplier (tiny dims), customer "
        "broadcast into date-filtered orders, the lineitem fact streams "
        "through one shuffle join; the c_nationkey = s_nationkey "
        "co-location predicate rides on the supplier join. Int-cents "
        "revenue on both engines.",
)
def ext_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    oc = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_nationkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    rev_cents = _revenue_cents()
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg((F.sum(rev_cents) / F.lit(100.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


@register(
    "ext_tpch_q18_large_orders",
    oracle="""
        SELECT c_custkey, o_orderkey,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                    AS BIGINT) / 100.0 AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_custkey, o_orderkey
        HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 25000
        ORDER BY total_qty DESC, o_orderkey
        LIMIT 20
    """,
    doc="TPC-H Q18-shaped group-HAVING top-k (large-volume orders): "
        "aggregate lineitem quantity per order, post-aggregation filter "
        "(HAVING), top-20. Quantity in int cents so the HAVING threshold "
        "cuts identically on both engines.",
)
def ext_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qty_cents = F.round(F.col("l_quantity") * 100, 0).cast("bigint")
    # no broadcast hints: the orders side is unfiltered, so its size
    # tracks the fact table — Catalyst broadcasts at bench scale, AQE
    # shuffles at 100 TB
    return (
        li.join(orders.join(cust, orders.o_custkey == cust.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("c_custkey", "o_orderkey")
        .agg(F.sum(qty_cents).alias("_cents"))
        .filter(F.col("_cents") > 25000)
        .select(
            "c_custkey",
            "o_orderkey",
            (F.col("_cents") / F.lit(100.0)).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


@register(
    "ext_cube_counts",
    oracle="""
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               COUNT(*) AS cnt
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status NULLS FIRST, priority NULLS FIRST, cnt
    """,
    doc="CUBE grouping sets (completes §2.6's 'free via Spark' set next "
        "to ext_rollup_counts): all 4 grouping combinations in one "
        "Expand+hash-agg pass — one shuffle, not four queries.",
)
def ext_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("status").asc_nulls_first(),
                 F.col("priority").asc_nulls_first(), "cnt")
    )


@register(
    "ext_pivot_status_by_priority",
    oracle="""
        SELECT o_orderpriority AS priority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
        FROM orders GROUP BY o_orderpriority ORDER BY priority
    """,
    doc="Pivot: order counts by priority x status. Spark's .pivot with an "
        "EXPLICIT value list — never let pivot scan for distinct values "
        "at 100 TB (that's an extra full pass); the oracle is the "
        "equivalent FILTERed aggregate.",
)
def ext_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    out = (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return out.select(
        "priority",
        F.coalesce("F", F.lit(0)).alias("f_cnt"),
        F.coalesce("O", F.lit(0)).alias("o_cnt"),
        F.coalesce("P", F.lit(0)).alias("p_cnt"),
    ).orderBy("priority")


@register(
    "op_csv_roundtrip",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation ORDER BY n_nationkey
    """,
    doc="OP-SRC-CSV + OP-SNK-CSV round-trip as one oracled query: the "
        "nation table is written to CSV with headers (the reference's "
        "Step-2 export format, S2:282-332) and read back with an explicit "
        "schema (no inference pass); the result must equal the source "
        "rows exactly — i.e. the CSV sink/source pair is lossless for "
        "the relational model.",
)
def op_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from data_wrangling_spark.sinks import write_csv
    from data_wrangling_spark.sources.tables import read_csv

    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    out = tempfile.mkdtemp(prefix="dws-csv-rt-") + "/nation"
    write_csv(nation, out)
    back = read_csv(
        spark, out,
        schema=nation.schema,
    )
    return back.orderBy("n_nationkey")


@register(
    "op_jsonl_roundtrip",
    oracle="""
        SELECT event_id, user_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS value_cents
        FROM events ORDER BY event_id
    """,
    doc="JSON-lines source/sink round-trip: events written as JSONL and "
        "read back with an explicit schema (no inference pass). Doubles "
        "survive Jackson's shortest-round-trip encoding; the oracle "
        "compares in cents anyway, consistent with the engine's exact-"
        "arithmetic rule.",
)
def op_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    out = tempfile.mkdtemp(prefix="dws-jsonl-rt-") + "/events"
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "event_id long, user_id long, event_type string, value double"
    ).json(out)
    return back.select(
        "event_id", "user_id", "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("value_cents"),
    ).orderBy("event_id")


@register(
    "op_orc_roundtrip",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation ORDER BY n_nationkey
    """,
    doc="ORC source/sink round-trip (Spark's second built-in columnar "
        "format — zero extra deps): write + read back must be lossless.",
)
def op_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    out = tempfile.mkdtemp(prefix="dws-orc-rt-") + "/nation"
    nation.write.mode("overwrite").orc(out)
    return spark.read.orc(out).orderBy("n_nationkey")


@register(
    "ext_anti_join",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '5-LOW')
        ORDER BY c_custkey
    """,
    doc="Left anti join (SURVEY.md §2.7 extension surface): customers "
        "with no 5-LOW-priority order. The priority slice keeps the "
        "result non-empty at every scale factor (20/220/2053 rows at "
        "sf0.001/0.01/0.1) — 'no orders at all' returned 0 rows, a "
        "zero-information green (round-2 verdict defect #1). Physical: "
        "broadcast/shuffled hash anti join — the orders side is reduced "
        "to its pushed-filter slice + join key by Catalyst.",
)
def ext_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    low = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "5-LOW")
    return (
        cust.join(low, cust.c_custkey == low.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "ext_semi_join",
    oracle="""
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 400000)
        ORDER BY c_custkey
    """,
    doc="Left semi join with a pushed predicate: customers having at "
        "least one order over 400k. The filter lands on the orders scan "
        "(PushedFilters) before the join.",
)
def ext_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )


#: one ANSI string, two engines: this exact text is BOTH the Spark SQL query
#: and the DuckDB oracle — the strongest form of the registry's
#: "queries and oracles generated from one spec" rule (SURVEY.md §7).
_SQL_API_QUERY = """
    SELECT r.r_name AS region, n.n_name AS nation, COUNT(*) AS n_suppliers
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region, nation
"""


@register(
    "ext_sql_api",
    oracle=_SQL_API_QUERY,
    doc="SQL front-end surface (SURVEY.md §3 entry point 3): temp views "
        "over the parquet tables + spark.sql. The registered SQL text is "
        "byte-identical to the oracle — Catalyst parses/optimizes the "
        "same ANSI string DuckDB runs. Physical: two broadcast joins "
        "(nation, region are tiny dims) into one supplier scan.",
)
def ext_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_API_QUERY)


@register(
    "x_stream_sessionize",
    # Full ANSI oracle (round-2 verdict item 3): batch gap-sessionization
    # plus the EXACT emission rule of the bounded drain — every session is
    # emitted except each user's trailing one when its event-time timeout
    # (session_end + gap, ms-truncated as Spark computes timeouts) has not
    # been STRICTLY passed by the final watermark (max ts - 30 min delay,
    # also ms-truncated). Exact-set equality is additionally pinned
    # Spark-side in tests/test_streaming_sessionize.py.
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
            FROM flagged
        ), agg AS (
            SELECT user_id, session_no, CAST(COUNT(*) AS BIGINT) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM sess GROUP BY user_id, session_no
        ), wm AS (
            SELECT epoch_us(max(ts)) // 1000 - 1800000 AS watermark_ms
            FROM events
        ), last_s AS (
            SELECT user_id, max(session_no) AS last_no
            FROM agg GROUP BY user_id
        )
        SELECT a.user_id, a.session_start, a.session_end, a.n_events
        FROM agg a JOIN last_s l USING (user_id), wm
        WHERE NOT (a.session_no = l.last_no
                   AND epoch_us(a.session_end) // 1000 + 1800000
                       >= wm.watermark_ms)
        ORDER BY a.user_id, a.session_start
    """,
    doc="Streaming gap sessionization, STATE-AWARE (round-8): "
        "sessionize_stream_auto picks between the two row-identical "
        "forms by the backlog's parquet-footer row count. Under the "
        "2M-row state budget it runs the NATIVE session_window "
        "aggregation — the faster form per the round-7 A/B (20x: 8.4s "
        "vs the custom stateful op's 23.7s; 100x: 50.2s vs 60.2s, "
        "SCALING.md streaming section): JVM-side window merge, no "
        "Arrow transfer. Over budget (a large bounded-backlog replay, "
        "where native state holds ~every event: measured 9.5M rows at "
        "100x vs the custom op's 150k user-bounded triples) it runs "
        "the custom applyInPandasWithState form instead — memory-safe "
        "where the native one would OOM the state store. Emission set "
        "is identical either way (pinned in "
        "tests/test_streaming_sessionize.py), so the pick is pure "
        "execution strategy. CROSSOVER GUIDANCE (round-11, r10 verdict "
        "item 8): the safety pick is not free — at 100x the custom "
        "form pays ~2.6-4x the native wall (48.1s vs 18.3s dedicated "
        "this round; 45.2 vs 10.9 round 10 — SCALING.md streaming "
        "table) to cap state at user cardinality (150k "
        "triples vs 9.5M per-event rows, a ~64x state reduction). "
        "Pass force='native' when the state store can hold the "
        "backlog — i.e. when backlog_rows x ~100 B/row fits the "
        "cluster's aggregate state budget (a bounded replay you sized, "
        "or RocksDB state backend with disk headroom); keep the "
        "default (auto) for open-ended replays where the backlog is "
        "unknown — OOMing a state store mid-replay costs more than "
        "the 4x wall. Sessions still open at the final "
        "watermark stay unemitted. Oracled: the emission set is "
        "deterministic for a bounded drain (see oracle comment).",
)
def x_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.streaming.events import sessionize_stream_auto

    out = sessionize_stream_auto(
        spark, sf_dir, table_name="q_stream_sessions_auto"
    )
    return out.orderBy("user_id", "session_start")


@register(
    "x_stream_sessionize_custom",
    # identical emission semantics to x_stream_sessionize (equivalence
    # pinned in tests/test_streaming_sessionize.py), so the same oracle
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
            FROM flagged
        ), agg AS (
            SELECT user_id, session_no, CAST(COUNT(*) AS BIGINT) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM sess GROUP BY user_id, session_no
        ), wm AS (
            SELECT epoch_us(max(ts)) // 1000 - 1800000 AS watermark_ms
            FROM events
        ), last_s AS (
            SELECT user_id, max(session_no) AS last_no
            FROM agg GROUP BY user_id
        )
        SELECT a.user_id, a.session_start, a.session_end, a.n_events
        FROM agg a JOIN last_s l USING (user_id), wm
        WHERE NOT (a.session_no = l.last_no
                   AND epoch_us(a.session_end) // 1000 + 1800000
                       >= wm.watermark_ms)
        ORDER BY a.user_id, a.session_start
    """,
    doc="Custom stateful streaming operator (applyInPandasWithState, "
        "event-time timeouts): gap sessionization with per-user "
        "(start, end, n) state — state bounded by ACTIVE USERS, not "
        "events (measured: 150k state rows while events grew 100x), "
        "the memory-safe form for continuous streams; ~20% slower than "
        "the native session_window registered as x_stream_sessionize "
        "(round-7 A/B, SCALING.md streaming section). Emits exactly the "
        "sessions the batch operator computes; sessions still open at "
        "the final watermark stay in state.",
)
def x_stream_sessionize_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.streaming.events import sessionize_stream

    out = sessionize_stream(spark, sf_dir, table_name="q_stream_sessions")
    return out.orderBy("user_id", "session_start")


@register(
    "x_dedup_clusters",
    # connected components IS SQL-expressible: transitive closure by a
    # recursive CTE (UNION fixpoint) over the same Jaccard pairs the
    # oracled x_dedup_ngram_jaccard pins, then min-reachable-id per node
    # — an engine-independent check of the iterative Pregel loop. Also
    # pinned against pure-Python union-find in tests/test_graph.py.
    oracle=r"""
        WITH RECURSIVE docs AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents WHERE doc_id < 200
        ), sh AS (
            SELECT doc_id, unnest(list_distinct(
                list_transform(range(1, greatest(len(toks) - 1, 1)),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            )) AS shingle
            FROM docs WHERE len(toks) >= 3
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        ), cand AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), jac AS (
            SELECT p.doc_a, p.doc_b
            FROM cand p JOIN sizes sa ON p.doc_a = sa.doc_id
                        JOIN sizes sb ON p.doc_b = sb.doc_id
            WHERE CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) >= 0.3
        ), edges AS (
            SELECT doc_a AS a, doc_b AS b FROM jac
            UNION ALL
            SELECT doc_b, doc_a FROM jac
        ), cc_nodes AS (
            SELECT DISTINCT a AS id FROM edges
        ), reach(id, r) AS (
            SELECT id, id FROM cc_nodes
            UNION
            SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a
        )
        SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id ORDER BY id
    """,
    doc="Pair→cluster collapse for dedup: connected components by "
        "min-label propagation over the exact n-gram Jaccard pairs "
        "(doc_id < 200 corpus slice). Each near-duplicate group gets its "
        "min doc_id as the canonical keep-representative. Iterative "
        "Pregel-style loop, localCheckpoint-truncated lineage "
        "(operators/graph.py).",
)
def x_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.dedup import ngram_jaccard_pairs
    from data_wrangling_spark.operators.graph import dedup_clusters

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3)
    return dedup_clusters(pairs).orderBy("id")


@register(
    "x_stream_dedup",
    oracle="""
        SELECT event_id, user_id, event_type
        FROM events ORDER BY event_id
    """,
    doc="Streaming exact dedup: the source directory stages the events "
        "file twice (at-least-once redelivery), "
        "dropDuplicatesWithinWatermark collapses the duplicates with "
        "watermark-bounded state. Exactly recovers the distinct source "
        "rows — full oracle parity for a streaming job.",
)
def x_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.streaming.events import dedup_stream

    out = dedup_stream(spark, sf_dir, table_name="q_stream_dedup")
    return out.orderBy("event_id")


@register(
    "ext_tpch_q10_returned_items",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
               n.n_name AS nation
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10-shaped returned-item revenue: four-table join with "
        "the nation dim broadcast, the returnflag filter pushed into "
        "the lineitem scan, int-cents revenue, top-20 via "
        "TakeOrderedAndProject (never a global sort of the full "
        "aggregate). Deterministic custkey tiebreak.",
)
def ext_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    cents = _revenue_cents()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg((F.sum(cents).cast("bigint") / 100.0).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "ext_topn_per_group",
    oracle="""
        SELECT o_orderpriority, o_orderkey, o_totalprice
        FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey)
                         AS rn
              FROM orders)
        WHERE rn <= 3
        ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
    """,
    doc="Top-N per group: 3 priciest orders per priority via row_number "
        "— Spark executes this as WindowGroupLimit (per-partition "
        "partial top-k BEFORE the shuffle, so the exchange carries at "
        "most N rows per group per input partition, not the whole "
        "table). Deterministic orderkey tiebreak. The generic form of "
        "every per-entity top-k in the engine.",
)
def ext_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", F.desc("o_totalprice"), "o_orderkey")
    )


def _pagerank_oracle_sql(n_iter: int = 10, damping: float = 0.85,
                         top: int = 12) -> str:
    """DuckDB oracle for x_graph_pagerank: a fixed iteration count makes
    power iteration SQL-expressible as a CHAIN of materialized CTEs —
    one (flows, dangling-total, new-ranks) triple per round, generated
    programmatically. MATERIALIZED is load-bearing: DuckDB would
    otherwise inline each CTE into its consumers and the 10-round chain
    re-expands exponentially (the unmaterialized form did not finish)."""
    parts = [r"""
        WITH ev AS MATERIALIZED (
            SELECT event_type,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ), edges_n AS MATERIALIZED (
            SELECT event_type AS src, next_type AS dst, COUNT(*) AS n
            FROM ev WHERE next_type IS NOT NULL GROUP BY 1, 2
        ), base AS MATERIALIZED (
            SELECT src, dst FROM (
                SELECT src, dst,
                       ROW_NUMBER() OVER (ORDER BY n DESC, src, dst) AS rn
                FROM edges_n
            ) WHERE rn <= %d
        ), nodes AS MATERIALIZED (
            SELECT DISTINCT id FROM (SELECT src AS id FROM base
                                     UNION SELECT dst FROM base)
        ), cnt AS MATERIALIZED (SELECT COUNT(*) AS c FROM nodes),
        deg AS MATERIALIZED (
            SELECT src, COUNT(*) AS out_deg FROM base GROUP BY 1
        ),
        it0 AS MATERIALIZED (
            SELECT id, 1.0 / (SELECT c FROM cnt) AS rank FROM nodes
        )""" % top]
    for k in range(1, n_iter + 1):
        parts.append("""
        , f%d AS MATERIALIZED (
            SELECT e.dst AS id, SUM(p.rank / d.out_deg) AS flowed
            FROM it%d p JOIN base e ON p.id = e.src
                        JOIN deg d ON e.src = d.src
            GROUP BY 1
        ), t%d AS MATERIALIZED (
            SELECT COALESCE(SUM(flowed), 0) AS total FROM f%d
        ), it%d AS MATERIALIZED (
            SELECT n.id,
                   %r / (SELECT c FROM cnt)
                   + %r * (COALESCE(f.flowed, 0)
                           + (1 - (SELECT total FROM t%d))
                             / (SELECT c FROM cnt)) AS rank
            FROM nodes n LEFT JOIN f%d f ON n.id = f.id
        )""" % (k, k - 1, k, k, k, 1 - damping, damping, k, k))
    parts.append("""
        SELECT id AS event_type, ROUND(rank, 6) AS rank
        FROM it%d ORDER BY event_type""" % n_iter)
    return "".join(parts)


@register(
    "x_graph_pagerank",
    # fixed-round power iteration IS SQL-expressible (chained CTEs, one
    # per round — see _pagerank_oracle_sql); also pinned against an
    # independent dense power iteration in tests/test_graph.py
    oracle=_pagerank_oracle_sql(),
    doc="PageRank (operators/graph.py) over the event-type transition "
        "graph restricted to the TOP-12 most frequent transitions "
        "(count desc, (src,dst) tiebreak — deterministic and SCALE-"
        "INVARIANT, unlike an absolute count cut: the unthresholded "
        "graph is complete at every sf, which would make every rank "
        "trivially 1/n, and absolute cuts degenerate to empty/complete "
        "at other sfs). Pregel-style rounds of join + groupBy-sum with "
        "localCheckpoint lineage truncation and exact dangling-mass "
        "redistribution (sum of ranks stays 1). The iterative-"
        "computation representative beside the connected-components "
        "clustering op. Output is the (deterministic) 10-round iterate "
        "— fixed iteration count, the standard PageRank practice.",
)
def x_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from data_wrangling_spark.operators.graph import pagerank

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    topw = Window.orderBy(F.desc("n"), "src", "dst")
    edges = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"), F.col("next_type").alias("dst")
        )
        .agg(F.count("*").alias("n"))
        .withColumn("rn", F.row_number().over(topw))
        .filter(F.col("rn") <= 12)
        .select("src", "dst")
    )
    out = pagerank(edges, n_iter=10)
    return out.select(
        F.col("id").alias("event_type"), F.round("rank", 6).alias("rank")
    ).orderBy("event_type")


@register(
    "ext_correlated_subquery",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c.c_custkey
    """,
    doc="Correlated scalar subquery (customers above their own nation's "
        "average balance), written AS a correlated subquery through the "
        "SQL front-end: Catalyst decorrelates it into one aggregate + "
        "one join instead of a per-row re-execution — the rewrite that "
        "makes such predicates tractable at 100 TB. Balance compared "
        "raw (exact), displayed in int cents.",
)
def ext_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("_ext_corr_customer")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM _ext_corr_customer c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal)
                             FROM _ext_corr_customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c.c_custkey
        """
    )


@register(
    "ext_ntile_deciles",
    oracle="""
        SELECT decile,
               COUNT(*) AS n,
               CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS lo_cents,
               CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS hi_cents
        FROM (SELECT o_totalprice,
                     NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey)
                         AS decile
              FROM orders)
        GROUP BY decile ORDER BY decile
    """,
    doc="NTILE decile banding of order values with exact int-cent band "
        "extents — the rank-based cousin of ext_histogram's fixed-width "
        "buckets. Deterministic orderkey tiebreak. EXACT NTILE semantics "
        "(ties split across tiles to force equal counts) WITHOUT the "
        "naive formulation's scale-killer: an unpartitioned NTILE window "
        "plans Exchange SinglePartition, funnelling every row through "
        "one task (that contrast is preserved in "
        "tests/test_plan_hygiene.py). Here the global rank is computed "
        "the way distributed engines actually rank, with DETERMINISTIC "
        "range buckets: cut points from exact_quantiles (histogram "
        "refinement — a deterministic computation, unlike "
        "RangePartitioner's per-job sampling), bucket = narrow CASE "
        "chain, collect the O(buckets) per-bucket counts, then rank = "
        "bucket offset + per-bucket row_number and the NTILE tile "
        "formula maps rank to decile as a narrow expression. "
        "Determinism means no persist pin: each pass may recompute the "
        "bucketing from scratch (a lost cache block under the earlier "
        "repartitionByRange form would have re-sampled boundaries and "
        "silently mis-offset ranks — round-5 review find). Every "
        "exchange is N-way; driver traffic is one row per bucket. Rows "
        "tied on the bucket value co-bucket by construction (bucket "
        "must be a function of the value alone or tied rows could "
        "straddle the offset boundary), so an extreme tie mass "
        "concentrates one bucket — same bound as any ordered ranking "
        "of ties. Sibling ext_deciles_scalable trades the ranked pass "
        "for pure boundary banding (ties never split).",
)
def ext_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from data_wrangling_spark.operators.quantiles import exact_quantiles

    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = orders.select(
        "o_totalprice", "o_orderkey", cents.alias("cents")
    )
    parts = 32
    # deterministic integer thresholds between the ~equal-mass buckets;
    # duplicates collapse (heavily tied data yields fewer, fatter
    # buckets — correct, just less parallel, see docstring)
    cuts = sorted(
        {
            int(c) + 1
            for c in exact_quantiles(
                base, "cents", [i / parts for i in range(1, parts)]
            )
        }
    )
    bucket = None
    for i, t in enumerate(cuts):
        cond = F.col("cents") < F.lit(t)
        bucket = F.when(cond, i) if bucket is None else bucket.when(cond, i)
    bucket = (
        F.lit(0) if bucket is None else bucket.otherwise(len(cuts))
    ).cast("int")
    bucketed = base.withColumn("_b", bucket)
    counts = {
        r["_b"]: r["cnt"]
        for r in bucketed.groupBy("_b")
        .agg(F.count("*").alias("cnt"))
        .collect()  # O(buckets) control-plane rows
    }
    total = sum(counts.values())
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    # NTILE(10) over N rows: the first N mod 10 tiles hold ceil(N/10)
    # rows, the rest floor(N/10) — mapped from the 1-based global rank
    q, rem = divmod(total, 10)
    boundary = rem * (q + 1)
    off_map = F.create_map(
        *[F.lit(x) for b in sorted(offsets) for x in (b, offsets[b])]
    )
    w = Window.partitionBy("_b").orderBy("o_totalprice", "o_orderkey")
    rank = (
        off_map[F.col("_b")].cast("long")
        + F.row_number().over(w).cast("long")
    )
    # max(q,1): when N < 10, every rank takes the THEN branch (boundary
    # == N), but ANSI still forbids a literal div 0 in the unevaluated
    # ELSE
    decile = F.expr(
        f"CAST(CASE WHEN _r <= {boundary} THEN (_r - 1) div {q + 1} + 1 "
        f"ELSE {rem} + (_r - {boundary} - 1) div {max(q, 1)} + 1 "
        f"END AS INT)"
    )
    return (
        bucketed.select("cents", rank.alias("_r"))
        .select("cents", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("decile")
    )


@register(
    "ext_deciles_scalable",
    oracle="""
        WITH c AS (
            SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), b AS (
            SELECT list_transform(
                       quantile_cont(cents, [0.1, 0.2, 0.3, 0.4, 0.5,
                                             0.6, 0.7, 0.8, 0.9]),
                       x -> round(x, 4)) AS bs
            FROM c
        )
        SELECT CAST(1 + len(list_filter(b.bs, x -> c.cents > x)) AS INT)
                   AS decile,
               COUNT(*) AS n,
               MIN(cents) AS lo_cents,
               MAX(cents) AS hi_cents
        FROM c, b
        GROUP BY 1 ORDER BY decile
    """,
    doc="SCALABLE decile banding — the two-pass percentile-boundary form "
        "the ext_ntile_deciles scale note promises: pass 1 computes the 9 "
        "exact interpolated decile boundaries via "
        "operators.quantiles.exact_quantiles (iterative histogram "
        "refinement: distributed hash-agg strata counts, O(strata) "
        "control-plane collects — the RangePartitioner boundary pattern, "
        "NEVER Spark's exact percentile aggregate, whose partial buffer "
        "holds every value and funnels the column through one task); "
        "pass 2 assigns each row by counting LITERAL cut points below "
        "its value (narrow expression, no join, no sort) and aggregates "
        "per band. No Exchange SinglePartition carries data rows in any "
        "job — contrast NTILE, which funnels every row through one task. "
        "Builds eagerly (boundary jobs run at plan-build time, like the "
        "layout operators). Semantics differ from NTILE at ties: equal "
        "values always land in the same band (boundary banding) instead "
        "of being split to force equal counts. Cross-engine determinism: "
        "banding compares int cents against boundaries ROUNDED to 4dp on "
        "both engines (python HALF_UP == Spark F.round == DuckDB round), "
        "so a last-ulp interpolation difference cannot flip a band.",
)
def ext_deciles_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.quantiles import (
        _round_half_up,
        exact_quantiles,
    )

    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    c = orders.select(cents.alias("cents"))
    probs = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    bounds = [
        _round_half_up(b, 4) for b in exact_quantiles(c, "cents", probs)
    ]
    decile = F.lit(1) + sum(
        (F.col("cents") > F.lit(b)).cast("int") for b in bounds
    )
    return (
        c.select("cents", decile.cast("int").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("decile")
    )


@register(
    "ext_fuzzy_join_snm",
    oracle="""
        WITH s AS (
            SELECT p_partkey AS id, p_name AS txt,
                   substring(p_name, 1, 2) AS pfx
            FROM part
        ), l AS (
            SELECT id, txt,
                   LEAD(id, 1) OVER w AS nid1, LEAD(txt, 1) OVER w AS ntxt1,
                   LEAD(id, 2) OVER w AS nid2, LEAD(txt, 2) OVER w AS ntxt2,
                   LEAD(id, 3) OVER w AS nid3, LEAD(txt, 3) OVER w AS ntxt3,
                   LEAD(id, 4) OVER w AS nid4, LEAD(txt, 4) OVER w AS ntxt4
            FROM s WINDOW w AS (PARTITION BY pfx ORDER BY txt, id)
        ), p AS (
            SELECT id, txt, nid1 AS nid, ntxt1 AS ntxt FROM l WHERE nid1 IS NOT NULL
            UNION ALL SELECT id, txt, nid2, ntxt2 FROM l WHERE nid2 IS NOT NULL
            UNION ALL SELECT id, txt, nid3, ntxt3 FROM l WHERE nid3 IS NOT NULL
            UNION ALL SELECT id, txt, nid4, ntxt4 FROM l WHERE nid4 IS NOT NULL
        ), c AS (
            SELECT CASE WHEN id < nid THEN id ELSE nid END AS id_a,
                   CASE WHEN id < nid THEN nid ELSE id END AS id_b,
                   CASE WHEN id < nid THEN txt ELSE ntxt END AS txt_a,
                   CASE WHEN id < nid THEN ntxt ELSE txt END AS txt_b
            FROM p
        )
        SELECT id_a, id_b, txt_a, txt_b,
               CAST(levenshtein(txt_a, txt_b) AS INT) AS distance
        FROM c WHERE levenshtein(txt_a, txt_b) <= 2
        ORDER BY id_a, id_b
    """,
    doc="Sorted-neighborhood fuzzy self-join (operators/fuzzy.py "
        "sorted_neighborhood_join): the complementary blocking strategy "
        "to the brand-equality blocks of ext_fuzzy_join_levenshtein — "
        "sort part names within 2-char-prefix blocks, compare each "
        "record to its 4 sorted neighbors, thresholded JVM levenshtein "
        "verify. One shuffle on the prefix, <=window candidates per "
        "record, no global sort. The oracle states the identical "
        "window+union construction in SQL.",
)
def ext_fuzzy_join_snm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.fuzzy import sorted_neighborhood_join

    part = _t(spark, sf_dir, "part")
    out = sorted_neighborhood_join(
        part, id_col="p_partkey", text_col="p_name", window=4, prefix_len=2,
        max_distance=2,
    )
    return out.select(
        "id_a", "id_b", "txt_a", "txt_b",
        F.col("distance").cast("int").alias("distance"),
    ).orderBy("id_a", "id_b")


@register(
    "ext_unpivot_measures",
    oracle="""
        WITH m AS (
            SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
            UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL SELECT 'l_discount', l_discount FROM lineitem
            UNION ALL SELECT 'l_tax', l_tax FROM lineitem
        )
        SELECT measure, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(val * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM m GROUP BY measure ORDER BY measure
    """,
    doc="UNPIVOT/melt (the inverse of ext_pivot_status_by_priority): "
        "lineitem's four measures to long form via DataFrame.unpivot — "
        "ONE scan emitting 4 rows per input row (Spark's Expand node), "
        "not four self-unions — then per-measure totals in int cents. "
        "The oracle states the same thing as portable UNION ALL.",
)
def ext_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )
    return (
        melted.groupBy("measure")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("val") * 100).cast("bigint")).alias("total_cents"),
        )
        .orderBy("measure")
    )


@register(
    "ext_gapfill_daily",
    oracle="""
        WITH ev AS (
            SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, event_type
            FROM events WHERE user_id < 10
        ), bounds AS (
            SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev
        ), days AS (
            SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM bounds
        ), grid AS (
            SELECT u.user_id, d.day
            FROM (SELECT DISTINCT user_id FROM ev) u, days d
        ), counts AS (
            SELECT user_id, day, COUNT(*) AS n_events
            FROM ev GROUP BY user_id, day
        ), ranked AS (
            SELECT user_id, day, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id, day
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ev
        ), daily AS (
            SELECT c.user_id, c.day, c.n_events, r.event_type AS day_last_type
            FROM counts c JOIN ranked r
              ON r.user_id = c.user_id AND r.day = c.day AND r.rn = 1
        )
        SELECT g.user_id,
               strftime(g.day, '%Y-%m-%d') AS day,
               COALESCE(d.n_events, 0) AS n_events,
               last_value(d.day_last_type IGNORE NULLS)
                   OVER (PARTITION BY g.user_id ORDER BY g.day
                         ROWS UNBOUNDED PRECEDING) AS last_type
        FROM grid g LEFT JOIN daily d USING (user_id, day)
        ORDER BY g.user_id, day
    """,
    doc="Time-series gap fill: dense per-user daily timeline (generated "
        "date spine × user dim, both tiny and broadcast) left-joined to "
        "per-day aggregates — missing days become explicit zero rows "
        "and the day's last event_type is carried FORWARD with "
        "last(ignorenulls) over an expanding frame (the standard "
        "forward-fill; O(n) per key, never a shrinking frame). Days "
        "before a user's first event stay NULL by design.",
)
def ext_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select("user_id", F.to_date("ts").alias("day"), "ts", "event_id", "event_type")
    )
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    grid = ev.select("user_id").distinct().crossJoin(F.broadcast(days))
    daily = ev.groupBy("user_id", "day").agg(
        F.count("*").alias("n_events"),
        F.max_by("event_type", F.struct("ts", "event_id")).alias("day_last_type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("day_last_type", ignorenulls=True).over(w).alias("last_type"),
        )
        .orderBy("user_id", "day")
    )


@register(
    "ext_histogram",
    oracle="""
        SELECT CAST(LEAST(FLOOR(value / 25), 19) AS INT) AS bucket,
               COUNT(*) AS n,
               CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS lo_cents,
               CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS hi_cents
        FROM events
        GROUP BY bucket ORDER BY bucket
    """,
    doc="Fixed-width histogram of events.value: bucket = floor(v/25) "
        "capped at 19 — one narrow projection + one bounded hash "
        "aggregate (at most 20 groups; map-side partials do everything), "
        "bucket extents reported in exact int cents. IEEE double "
        "division + floor is bit-identical across engines.",
)
def ext_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        ev.groupBy(
            F.least(F.floor(F.col("value") / 25), F.lit(19)).cast("int").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min(cents).alias("lo_cents"),
            F.max(cents).alias("hi_cents"),
        )
        .orderBy("bucket")
    )


@register(
    "x_text_keyword_search",
    oracle=r"""
        SELECT doc_id, CAST(COUNT(DISTINCT g) AS INT) AS n_matched
        FROM (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS g
              FROM documents)
        WHERE g IN ('spark', 'window')
        GROUP BY doc_id
        HAVING COUNT(DISTINCT g) >= 2
        ORDER BY doc_id
    """,
    doc="Inverted-index keyword search (operators/text_analysis.py "
        "keyword_search): AND-match of a 2-term query via postings "
        "explode with the term filter BEFORE the shuffle (the aggregate "
        "sees query-term postings only). At 100 TB the identical plan "
        "runs against a pre-built token-partitioned posting table.",
)
def x_text_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import keyword_search

    docs = _t(spark, sf_dir, "documents")
    return keyword_search(docs, ["spark", "window"], mode="all").orderBy("doc_id")


@register(
    "x_stream_enrich",
    oracle="""
        SELECT COALESCE(c.c_mktsegment, '<unknown>') AS segment,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1 ORDER BY 1
    """,
    doc="Stream-static enrichment join (streaming/events.py "
        "enrich_stream): events stream left-joins the broadcast "
        "customer dimension per micro-batch, unmatched users kept "
        "under '<unknown>', per-segment counts + int-cent value sums. "
        "Batch-equivalent aggregate => full oracle parity for a "
        "streaming job.",
)
def x_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.streaming.events import enrich_stream

    out = enrich_stream(spark, sf_dir, table_name="q_stream_enrich")
    return out.orderBy("segment")


@register(
    "x_stream_stream_join",
    oracle="""
        SELECT c.user_id, COUNT(*) AS n_pairs
        FROM events c JOIN events p
          ON p.user_id = c.user_id
         AND c.event_type = 'click'
         AND p.event_type = 'purchase'
         AND p.ts >= c.ts
         AND p.ts <  c.ts + INTERVAL 1 HOUR
        GROUP BY c.user_id
        ORDER BY c.user_id
    """,
    doc="Stream-STREAM join (streaming/events.py attribution_stream): "
        "clicks x purchases within a 1-hour event-time window per "
        "user, both sides watermarked so buffered join state is "
        "EVICTED past watermark+window instead of growing forever — "
        "the state-boundedness requirement at 100 TB. Inner-join "
        "emission is immediate, so the bounded drain equals the batch "
        "join exactly: full oracle parity.",
)
def x_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.streaming.events import attribution_stream

    out = attribution_stream(spark, sf_dir, table_name="q_stream_stream_join")
    return out.orderBy("user_id")


@register(
    "x_text_redact_pii",
    oracle=r"""
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                 '\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS redacted
        FROM documents ORDER BY doc_id
    """,
    doc="X-TEXT PII scrub: email/SSN/phone spans replaced with typed "
        "placeholders via chained JVM regexp_replace (no UDF). The "
        "oracle applies the identical patterns with DuckDB's 'g' flag "
        "(Spark replaces all matches by default). Planted-PII behavior "
        "pinned in tests/test_text_redact.py.",
)
def x_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.functions.text import redact_pii

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", redact_pii("text").alias("redacted")).orderBy("doc_id")


@register(
    "x_text_lexical_diversity",
    oracle=r"""
        SELECT doc_id,
               ROUND(CAST(len(list_distinct(string_split_regex(trim(text), '\s+')))
                          AS DOUBLE)
                     / len(string_split_regex(trim(text), '\s+')), 6)
                   AS distinct_ratio
        FROM documents ORDER BY doc_id
    """,
    doc="X-TEXT repetition signal: distinct-token ratio (C4/Gopher-style "
        "quality cut — boilerplate and generated spam score low). Narrow "
        "array expressions, no shuffle.",
)
def x_text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.functions.text import distinct_token_ratio

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(distinct_token_ratio("text"), 6).alias("distinct_ratio")
    ).orderBy("doc_id")


@register(
    "x_text_curation_pipeline",
    oracle=r"""
        WITH redacted AS (
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                     '\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS rtext
            FROM documents
        ), scored AS (
            SELECT doc_id, rtext,
                   len(string_split_regex(trim(rtext), '\s+')) AS n_tokens,
                   CAST(len(list_distinct(string_split_regex(trim(rtext), '\s+')))
                        AS DOUBLE)
                     / len(string_split_regex(trim(rtext), '\s+')) AS distinct_ratio
            FROM redacted
        ), kept AS (
            SELECT * FROM scored WHERE n_tokens >= 5 AND distinct_ratio >= 0.3
        )
        SELECT md5(trim(regexp_replace(regexp_replace(lower(rtext),
                                                      '\s+', ' ', 'g'),
                                       '[^a-z0-9 ]', '', 'g'))) AS fingerprint,
               CAST(min(doc_id) AS BIGINT) AS doc_id,
               COUNT(*) AS n_duplicates,
               CAST(min(n_tokens) AS INT) AS n_tokens
        FROM kept
        GROUP BY 1 ORDER BY doc_id
    """,
    doc="Flagship corpus-curation pipeline, ONE declarative plan: PII "
        "redaction → quality scoring (token count, lexical diversity) → "
        "threshold filter → canonical-fingerprint dedup keeping the min "
        "doc_id. Every stage is a narrow JVM expression; the only "
        "shuffle is the final dedup groupBy — at 100 TB the whole "
        "curation pass is scan-bound. Full DuckDB oracle over the "
        "composed CTEs.",
    bench=True,
)
def x_text_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.functions.text import (
        distinct_token_ratio_from_tokens,
        fingerprint,
        redact_pii,
        tokens,
    )

    docs = _t(spark, sf_dir, "documents")
    # readability refactor only: the optimized plan is bit-identical to
    # the inline form (PushDownPredicate substitutes the n_tokens /
    # distinct_ratio aliases into the filter and CollapseProject
    # re-inlines the rest, so the expression duplicates remain — review-
    # verified), and per-operator codegen CSE is what actually dedups
    # them at runtime
    kept = (
        docs.withColumn("rtext", redact_pii("text"))
        .withColumn("_toks", tokens("rtext"))
        .withColumn("n_tokens", F.size("_toks"))
        .withColumn(
            "distinct_ratio", distinct_token_ratio_from_tokens(F.col("_toks"))
        )
        .filter((F.col("n_tokens") >= 5) & (F.col("distinct_ratio") >= 0.3))
    )
    return (
        kept.groupBy(fingerprint("rtext").alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").alias("n_duplicates"),
            F.min("n_tokens").cast("int").alias("n_tokens"),
        )
        .select("fingerprint", "doc_id", "n_duplicates", "n_tokens")
        .orderBy("doc_id")
    )


@register(
    "ext_range_join_attribution",
    oracle="""
        SELECT p.event_id AS purchase_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events p JOIN events e
          ON e.user_id = p.user_id
         AND e.ts >= p.ts
         AND e.ts <  p.ts + INTERVAL 1 DAY
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id
        ORDER BY purchase_id
    """,
    doc="Interval/range join, keyed shape (operators/temporal.py "
        "interval_join): attribute every event to each purchase by the "
        "same user whose 1-day attribution window contains it — the "
        "classic marketing-attribution join. The equality conjunct on "
        "user makes it a plain equi shuffle join with the range "
        "predicate as a post-join filter (never a nested-loop); event "
        "values summed in int cents.",
)
def ext_range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.temporal import interval_join

    ev = _t(spark, sf_dir, "events")
    points = ev.select("event_id", "ts", "user_id", "value")
    wins = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("w_end"),
    )
    pairs = interval_join(points, wins, "ts", "w_start", "w_end", on="user_id")
    return (
        pairs.groupBy("purchase_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .orderBy("purchase_id")
    )


@register(
    "ext_range_join_bucketed",
    oracle="""
        WITH win AS (
            SELECT w_start, w_start + INTERVAL 3 DAY AS w_end
            FROM (SELECT DISTINCT date_trunc('day', ts) AS w_start
                  FROM events ORDER BY w_start LIMIT 5)
        )
        SELECT w.w_start, COUNT(*) AS n_events
        FROM win w JOIN events e
          ON e.ts >= w.w_start AND e.ts < w.w_end
        GROUP BY w.w_start
        ORDER BY w.w_start
    """,
    doc="Interval join, KEYLESS bucketed shape: count events inside five "
        "overlapping 3-day windows with no equi key at all. Naive Spark "
        "plans this as BroadcastNestedLoopJoin (every event against "
        "every window); interval_join(bucket_seconds=window length) "
        "instead explodes each window to the <=2 buckets it overlaps "
        "and joins on bucket equality — an ordinary hash join whose "
        "blowup is bounded by len/W, with the exact range predicate "
        "re-checked after the bucket match. The scale path for range "
        "joins against large interval tables.",
)
def ext_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.temporal import interval_join

    ev = _t(spark, sf_dir, "events").select("event_id", "ts")
    win = (
        ev.select(F.date_trunc("day", "ts").alias("w_start"))
        .distinct()
        .orderBy("w_start")
        .limit(5)
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 3 DAYS"))
    )
    pairs = interval_join(ev, win, "ts", "w_start", "w_end", bucket_seconds=3 * 86400)
    return pairs.groupBy("w_start").agg(F.count("*").alias("n_events")).orderBy("w_start")


@register(
    "x_text_tfidf",
    oracle=r"""
        WITH words AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2
        ), dl AS (
            SELECT doc_id, SUM(tf) AS doc_len FROM tf GROUP BY 1
        ), df AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT t.doc_id, t.term,
                   ROUND((CAST(t.tf AS DOUBLE) / dl.doc_len)
                         * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
            FROM tf t JOIN dl USING (doc_id) JOIN df USING (term), n
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, term) AS rank
            FROM scored
        )
        SELECT doc_id, term, tfidf, rank FROM ranked
        WHERE rank <= 3 ORDER BY doc_id, rank
    """,
    doc="TF-IDF top-3 terms per document (operators/text_analysis.py "
        "tf_idf): corpus explode → (doc,term) partial-agg → vocabulary-"
        "sized document-frequency join → broadcast corpus count → "
        "WindowGroupLimit top-k. Score rounded BEFORE ranking with a "
        "term tiebreak so a last-ulp libm ln() difference between "
        "engines cannot flip ranks.",
)
def x_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import tf_idf

    docs = _t(spark, sf_dir, "documents")
    return tf_idf(docs, "doc_id", "text", top_k=3).orderBy("doc_id", "rank")


@register(
    "x_text_repetition",
    oracle=r"""
        WITH words AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents
        ), wtok AS (
            SELECT doc_id, unnest(w) AS g FROM words
        ), wcnt AS (
            SELECT doc_id, g, COUNT(*) AS cnt FROM wtok GROUP BY 1, 2
        ), wagg AS (
            SELECT doc_id, MAX(cnt) AS top, SUM(cnt) AS n, COUNT(*) AS ndist
            FROM wcnt GROUP BY 1
        ), big AS (
            SELECT doc_id,
                   list_transform(range(1, len(w)),
                                  i -> w[i] || ' ' || w[i + 1]) AS b
            FROM words
        ), btok AS (
            SELECT doc_id, unnest(b) AS g FROM big
        ), bcnt AS (
            SELECT doc_id, g, COUNT(*) AS cnt FROM btok GROUP BY 1, 2
        ), bagg AS (
            SELECT doc_id, MAX(cnt) AS top, SUM(cnt) AS n, COUNT(*) AS ndist
            FROM bcnt GROUP BY 1
        )
        SELECT w.doc_id,
               CAST(w.n AS INT) AS n_words,
               ROUND(CAST(w.top AS DOUBLE) / w.n, 6) AS top_word_frac,
               ROUND(CAST(b.top AS DOUBLE) / b.n, 6) AS top_bigram_frac,
               ROUND(1 - CAST(b.ndist AS DOUBLE) / b.n, 6) AS dup_bigram_frac
        FROM wagg w LEFT JOIN bagg b USING (doc_id)
        ORDER BY w.doc_id
    """,
    doc="Gopher-style repetition quality signals per document "
        "(operators/text_analysis.py repetition_signals): most-frequent-"
        "word fraction, most-frequent-bigram fraction, duplicate-bigram "
        "fraction. Bigrams via zip_with over shifted slices (narrow), "
        "modes via explode + hash aggregate with map-side partials — "
        "the filters corpus curation cuts on, exactly mirrored in "
        "DuckDB list lambdas.",
)
def x_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import repetition_signals

    docs = _t(spark, sf_dir, "documents")
    return repetition_signals(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "ext_merge_upsert",
    oracle="""
        WITH updates AS (
            SELECT c_custkey, c_name, c_nationkey, c_acctbal,
                   'PROMO' AS c_mktsegment
            FROM customer WHERE c_custkey % 97 = 0
        )
        SELECT * FROM updates
        UNION ALL
        SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
               c.c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM updates u
                          WHERE u.c_custkey = c.c_custkey)
        ORDER BY c_custkey
    """,
    doc="MERGE INTO-shaped SCD1 upsert (operators/merge.py): a derived "
        "update batch (every 97th customer moves to segment PROMO) "
        "replaces matching target rows, everything else passes through "
        "— one left-anti join (update side broadcast when small) plus a "
        "union, no table rewrite of unchanged rows. The partitioned-"
        "table write twin (dynamic partition overwrite) is exercised in "
        "tests/test_merge.py.",
)
def ext_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.merge import merge_upsert

    cust = _t(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 97 == 0).withColumn(
        "c_mktsegment", F.lit("PROMO")
    )
    return merge_upsert(cust, updates, "c_custkey").orderBy("c_custkey")


@register(
    "x_sim_topk_ivf",
    oracle=golden_oracle("x_sim_topk_ivf"),  # pinned-snapshot golden;
        # recall pinned in tests/test_similarity.py
    doc="X-SIM-SEARCH IVF path: Voronoi-cell partition of the corpus "
        "(deterministic centroids; k-means at scale), nprobe=3 cells "
        "searched per query. Rows-only driver check; tests measure "
        "recall vs brute force.",
)
def x_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.similarity import topk_ivf

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return topk_ivf(emb, q, "vec_id", "embedding", k=5, n_cells=8, nprobe=3).orderBy(
        "query_id", "rank"
    )


# ---------------------------------------------------------------------------
# round 5 widening: TPC-H-shaped join/agg coverage (Q7/Q8/Q13/Q14/Q19/Q22
# adapted to the testdata schema) + three training-pipeline operators
# (context-window chunking, temperature-scaled mixture, boilerplate spans).
# ---------------------------------------------------------------------------


@register(
    "ext_tpch_q7_volume_shipping",
    oracle="""
        SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey  = o_custkey
        JOIN supplier ON s_suppkey  = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE r1.r_name <> r2.r_name
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY supp_region, cust_region, l_year
        ORDER BY supp_region, cust_region, l_year
    """,
    doc="TPC-H Q7-shaped cross-region volume shipping (region pairs "
        "instead of the spec's nation pair so the result is non-empty "
        "at every test SF): both sides of the fact resolve their "
        "geography through broadcast nation⨝region lookups, the "
        "<> predicate filters AFTER both joins (it references both "
        "sides). Round-11 rework (r10 verdict item 2 — 3.8x dedicated "
        "at 100x): the SUPPLIER projection is broadcast-HINTED so the "
        "li-side lookup stays a broadcast join instead of silently "
        "degrading to a third SMJ shuffle (fresh-JVM A/B at 100x: "
        "4.35s vs 4.94s unhinted). Round-12 correction of the WHY: "
        "supplier is a fixed 1000-row dim at every bench multiplier "
        "(~13 KB projected), nowhere near the 10 MB threshold — what "
        "degrades unhinted is Catalyst's post-join size ESTIMATE for "
        "supplier⨝nation⨝region (join estimates compound "
        "multiplicatively without stats), verified by plan read: the "
        "initial physical plan picks SMJ for li⨝supp. The hint "
        "corrects the estimator using what we know about the data. "
        "Because a hint overrides every size threshold, it is "
        "SIZE-GATED on the supplier table's actual on-disk bytes "
        "(<64 MB): a real TPC-H deployment where supplier grows with "
        "SF (10k rows/SF — ~GBs at the 100 TB point) keeps the "
        "adaptive SMJ fallback instead of risking a broadcast OOM. "
        "Broadcasting the CUSTOMER projection too — the "
        "obvious next step, it would delete the orders-side shuffle — "
        "was REJECTED on measurement: 14.5s cust-only / 6.6s both vs "
        "4.35s supp-only (fresh JVM, median-of-3). A 1.5M-entry "
        "broadcast hash relation is built per execution and probed "
        "randomly by 32 threads across a >100 MB table; the SMJ it "
        "replaces streams sorted runs instead, and its shuffle of the "
        "narrow orders projection is cheaper than the build+probe. "
        "The resulting plan is the measured two-fact floor — stage "
        "probes: li scan+filter 0.9s, orders SMJ customer 1.8s, "
        "li shuffle + merge + agg ~1.6s (SCALING.md q7 floor note). "
        "Round-14 re-probe (verdict item 2, bench_q7_ab.py shj* "
        "variants): the 1996-1998 shipdate window IS in the lineitem "
        "PushedFilters (plans/r14 before dump — the suspected miss "
        "was unfounded), and SHUFFLE_HASH-hinting either or both "
        "fact joins measured a WASH across 6 interleaved fresh-JVM "
        "pairs (3 wins/3 losses; shipped 4.33-6.58s vs both-SHJ "
        "4.41-7.74s medians, pooled mins 4.29 vs 3.99) — unlike "
        "q21/q9 there is no window/aggregate riding the join's "
        "partitioning to bank the sort removal, and the nation-pair "
        "<> predicate keeps 4/5 of region pairs (not selective "
        "enough to semi-push). The two-fact floor stands. "
        "Int-cents revenue.",
)
def ext_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    nr = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "r_name")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("r_name").alias("cust_region"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate",
                _revenue_cents().alias("_cents"))
    )
    oc = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "cust_region"
    )
    # size-gate: hint only while supplier is provably broadcast-sized
    # on disk; past the gate the plan stays adaptive (see docstring)
    supp_hinted = (
        F.broadcast(supp)
        if _table_disk_bytes(sf_dir, "supplier") < (64 << 20)
        else supp
    )
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .join(supp_hinted, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("supp_region") != F.col("cust_region"))
        .groupBy(
            "supp_region",
            "cust_region",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            (F.sum("_cents") / F.lit(100.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_region", "cust_region", "l_year")
    )


@register(
    "ext_tpch_q8_market_share",
    oracle="""
        WITH flat AS (
            SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) AS cents,
                   n1.n_name AS supp_nation
            FROM lineitem
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN part     ON p_partkey  = l_partkey
            JOIN supplier ON s_suppkey  = l_suppkey
            JOIN customer ON c_custkey  = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region   ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents
                             ELSE 0 END) AS BIGINT) AS mkt_cents,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(floor(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                        THEN cents ELSE 0 END) AS DOUBLE)
                          / CAST(SUM(cents) AS DOUBLE) * 1000000.0)
                    AS BIGINT) AS mkt_share_ppm
        FROM flat GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8-shaped market share: NATION_3 suppliers' slice of "
        "STANDARD-part revenue sold into AMERICA customers, by order "
        "year. The share is a conditional-sum ratio inside ONE "
        "aggregate (no second pass, no self-join); both sums are exact "
        "int cents and the ppm share is floor(a/b*1e6) of bit-identical "
        "IEEE doubles, so the driver hash is stable. Dims broadcast; "
        "the part/customer side joins are unhinted for AQE at scale. "
        "Round-13 stage probe (scripts/bench_q8_ab.py, fresh-JVM "
        "medians at 100x): full 3.86s == li-side scan+project 1.75s + "
        "orders-side filter+region-semi 2.04s; the li x orders SMJ "
        "stage alone reproduces the full wall (4.12s) and "
        "broadcast-hinting the ~0.9M-row filtered orders side is a "
        "wash (3.70s — the q7 lesson: multi-MB hints just past the "
        "auto threshold don't pay). Two-fact-shuffle floor: both "
        "sides must be scanned and exchanged; nothing left to remove.",
)
def ext_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_in_region = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").cast("int").alias("o_year"))
    )
    supp_nation = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _revenue_cents().alias("_cents")
    )
    mkt = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("_cents")).otherwise(F.lit(0))
    )
    total = F.sum("_cents")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            mkt.cast("bigint").alias("mkt_cents"),
            total.cast("bigint").alias("total_cents"),
            F.floor(
                mkt.cast("double") / total.cast("double") * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("mkt_share_ppm"),
        )
        .orderBy("o_year")
    )


@register(
    "ext_tpch_q13_order_distribution",
    oracle="""
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        )
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(COUNT(*) AS BIGINT) AS custdist
        FROM per_cust GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13-shaped customer order-count distribution. Spark plan "
        "pre-aggregates orders per custkey BEFORE the outer join (the "
        "join then matches one row per customer instead of one per "
        "order — the shuffle carries |customers| rows, not |orders|), "
        "LEFT join + coalesce(0) recovers order-less customers, second "
        "tiny agg builds the histogram. Same result as the textbook "
        "outer-join-then-count formulation the oracle uses. Round-13 "
        "stage probe (scripts/bench_q13_ab.py, 100x solo): the "
        "per-custkey orders aggregate ALONE is 2.52s of the query's "
        "2.68s — a 15M-row, 1.5M-group hash aggregate, the "
        "engine-constant floor also documented on q4_top_users; "
        "flipping the join to broadcast(per_cust_orders) RIGHT OUTER "
        "customer measured WORSE (3.43s — the 1.5M-row broadcast build "
        "costs more than the customer-side exchange it removes), so "
        "the SMJ/SHJ left join stays.",
)
def ext_tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust_orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    per_cust = cust.join(
        per_cust_orders, cust.c_custkey == F.col("o_custkey"), "left"
    ).select(F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "ext_tpch_q14_promo_revenue",
    oracle="""
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(ROUND(l_extendedprice * (1 - l_discount)
                                             * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS promo_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS total_cents,
               CAST(floor(CAST(SUM(CASE WHEN p_type = 'PROMO'
                                        THEN CAST(ROUND(l_extendedprice
                                                        * (1 - l_discount) * 100)
                                                  AS BIGINT)
                                        ELSE 0 END) AS DOUBLE)
                          / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                                * 100) AS BIGINT)) AS DOUBLE)
                          * 1000000.0) AS BIGINT) AS promo_share_ppm
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    doc="TPC-H Q14-shaped promo revenue share for one ship month: a "
        "single conditional-sum aggregate over the month's lineitems "
        "joined to part. The date filter reaches the lineitem parquet "
        "scan (PushedFilters), so the join input is one month of the "
        "fact, and the share ratio needs no second pass. ppm share via "
        "floor of bit-identical doubles.",
)
def ext_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .select("l_partkey", _revenue_cents().alias("_cents"))
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("_cents")).otherwise(F.lit(0))
    )
    total = F.sum("_cents")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            promo.cast("bigint").alias("promo_cents"),
            total.cast("bigint").alias("total_cents"),
            F.floor(promo.cast("double") / total.cast("double") * F.lit(1000000.0))
            .cast("bigint")
            .alias("promo_share_ppm"),
        )
    )


@register(
    "ext_tpch_q19_disjunctive_pushdown",
    oracle="""
        SELECT p_brand,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 35)
           OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 50)
        GROUP BY p_brand ORDER BY p_brand
    """,
    doc="TPC-H Q19-shaped disjunctive predicate join: three "
        "brand/size/quantity branches OR-ed across the join. Catalyst "
        "extracts the single-side residues of the disjunction (brand ∈ "
        "{...} to the part scan, quantity ∈ [1,50] to the lineitem "
        "scan) so each input is pre-filtered before the equi-join and "
        "the full OR evaluates only on surviving matches — the plan "
        "shape that keeps disjunctions from forcing full-fact joins at "
        "100 TB.",
)
def ext_tpch_q19_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _revenue_cents().alias("_cents")
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(branch)
        .groupBy("p_brand")
        .agg(
            (F.sum("_cents") / F.lit(100.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


@register(
    "ext_tpch_q22_dormant_customers",
    oracle="""
        WITH c AS (
            SELECT c_custkey, c_nationkey,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer
        ), s AS (
            SELECT CAST(SUM(cents) AS BIGINT) AS pos_sum,
                   CAST(COUNT(*) AS BIGINT) AS pos_n
            FROM c WHERE cents > 0
        )
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(cents) AS BIGINT) / 100.0 AS totacctbal
        FROM c, s
        WHERE cents * pos_n > pos_sum
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    doc="TPC-H Q22-shaped dormant high-balance customers: balance above "
        "the positive-balance average AND no order since 2000. The "
        "average threshold is compared EXACTLY in integers (cents * n > "
        "sum avoids engine-specific float summation); the threshold is "
        "a 1-row aggregate broadcast (whitelisted tiny-side BNLJ, same "
        "pattern as TF-IDF's corpus count), and the no-recent-order "
        "test is a left_anti join against date-filtered orders — "
        "shuffle on custkey, no correlated re-execution.",
)
def ext_tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("_cents"),
    )
    stats = cust.filter(F.col("_cents") > 0).agg(
        F.sum("_cents").cast("bigint").alias("_pos_sum"),
        F.count(F.lit(1)).alias("_pos_n"),
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    cand = (
        cust.join(F.broadcast(stats))
        .filter(F.col("_cents") * F.col("_pos_n") > F.col("_pos_sum"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        cand.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("_cents") / F.lit(100.0)).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "x_text_chunk_overlap",
    oracle=r"""
        WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents
            WHERE text IS NOT NULL AND trim(text) <> ''
        ), starts AS (
            SELECT doc_id, toks,
                   unnest(range(0, len(toks), 24)) AS st
            FROM tok
        )
        SELECT doc_id,
               CAST(st // 24 AS INTEGER) AS chunk_id,
               CAST(len(list_slice(toks, st + 1, st + 32)) AS INTEGER) AS n_words,
               array_to_string(list_slice(toks, st + 1, st + 32), ' ')
                   AS chunk_text
        FROM starts
    """,
    doc="Context-window chunking (X-TEXT, operators/text_analysis.py "
        "chunk_overlapping): 32-word sliding windows at stride 24 (8 "
        "words of overlap), the LLM-training pass that splits long "
        "documents into model-context-sized pieces without losing "
        "boundary spans. Narrow plan — split, sequence of starts, "
        "posexplode, slice — no shuffle at all (deliberately unsorted: "
        "the driver compare is order-insensitive, and a cosmetic "
        "ORDER BY would be the plan's only exchange); output grows by "
        "n_words/stride per doc.",
)
def x_text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import chunk_overlapping

    docs = _t(spark, sf_dir, "documents")
    return chunk_overlapping(docs, "text", "doc_id", size=32, stride=24)


@register(
    "x_corpus_temperature_mixture",
    oracle=r"""
        WITH per AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(len(string_split_regex(trim(text), '\s+')))
                        AS BIGINT) AS n_weight
            FROM documents GROUP BY source
        ), scaled AS (
            SELECT source, n_rows, n_weight,
                   CAST(floor(sqrt(CAST(GREATEST(n_weight, 0) AS DOUBLE))
                              * 1000000.0)
                        AS BIGINT) AS w_fp
            FROM per
        ), tot AS (SELECT CAST(SUM(w_fp) AS BIGINT) AS w_total FROM scaled)
        SELECT source, n_rows, n_weight,
               CAST(floor(CAST(w_fp AS DOUBLE) / CAST(w_total AS DOUBLE)
                          * 1000000.0) AS BIGINT) AS weight_ppm
        FROM scaled, tot ORDER BY source
    """,
    doc="Temperature-scaled corpus mixture (operators/splits.py "
        "temperature_mixture): per-source sampling weights proportional "
        "to sqrt(token mass), the mT5-style alpha=0.5 flattening that "
        "upsamples low-resource sources. alpha is pinned at 0.5 because "
        "IEEE sqrt is correctly rounded — the whole computation is "
        "engine-exact fixed-point, hence this full-value oracle. One "
        "strata-sized aggregate + a 1-row total broadcast.",
)
def x_corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.splits import temperature_mixture

    docs = _t(spark, sf_dir, "documents")
    return temperature_mixture(docs, "source", token_count("text")).orderBy("source")


@register(
    "x_text_boilerplate_spans",
    oracle=r"""
        WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents WHERE text IS NOT NULL
        ), grams AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(toks) - 1, 1)),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                       AS span
            FROM tok WHERE len(toks) >= 3
        )
        SELECT span, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM grams GROUP BY span HAVING COUNT(*) >= 2
        ORDER BY n_docs DESC, span LIMIT 20
    """,
    doc="Boilerplate-span detection (operators/text_analysis.py "
        "boilerplate_spans): 3-gram spans shared verbatim by >= 2 "
        "distinct documents, top-20 by document frequency "
        "(deterministic span tiebreak). Per-doc DISTINCT shingles mean "
        "count(*) IS the doc frequency — one explode + one hash "
        "aggregate with map-side partials, no count-distinct state, no "
        "pairwise comparison.",
)
def x_text_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import boilerplate_spans

    docs = _t(spark, sf_dir, "documents")
    return boilerplate_spans(docs, "text", "doc_id", n=3, min_docs=2, top=20)


@register(
    "ext_tpch_q4_late_shipments",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4-shaped priority count of late-shipping orders (some "
        "line shipped >60 days after order date; the schema has no "
        "commitdate/receiptdate so the lateness predicate adapts to "
        "shipdate-vs-orderdate). The EXISTS becomes one left_semi hash "
        "join on orderkey with the non-equi date conjunct evaluated on "
        "matches — no per-row re-execution, half-year filter pushed to "
        "the orders scan. Round 13 (guide §3.2): the join conjunct "
        "l_shipdate > o_orderdate + 60d with o_orderdate >= 1997-01-01 "
        "IMPLIES l_shipdate > 1997-03-02 — a derived bound the "
        "optimizer cannot infer across the non-equi conjunct; adding "
        "it explicitly pushes to the lineitem parquet scan "
        "(PushedFilters) and drops most of the fact before the semi "
        "join's exchange (value-identical: any matching pair already "
        "satisfies the stronger per-pair bound; ~4.1s -> ~2.8s "
        "steady-state at 100x). Interval arithmetic is timestamp + 60 "
        "days on both engines (exact, no timezone dependence in this "
        "container's UTC session).",
)
def ext_tpch_q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        # derived from the join conjunct + the orders date floor:
        # 1997-01-01 + 60 days (see doc) — scan-pushed pre-filter
        .filter(F.col("l_shipdate") > F.lit("1997-03-02").cast("timestamp"))
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "ext_tpch_q6_forecast_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100)
                             AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6-shaped forecast-revenue delta: a single selective "
        "scan-aggregate whose ENTIRE predicate set (shipdate range, "
        "discount band, quantity cap) reaches the parquet scan as "
        "PushedFilters with a 4-column ReadSchema — the pure predicate-"
        "pushdown showcase; no join, no shuffle beyond the 1-row "
        "aggregate merge. Revenue = price * discount in exact cents.",
)
def ext_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    cents = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 100, 0
    ).cast("bigint")
    return li.agg(
        (F.sum(cents) / F.lit(100.0)).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "ext_tpch_q17_small_quantity",
    oracle="""
        WITH pa AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                        AS BIGINT) AS qty_sum,
                   CAST(COUNT(*) AS BIGINT) AS qty_n
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) / 100.0 AS total_price,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN pa   ON pa.l_partkey = lineitem.l_partkey
        WHERE p_brand = 'Brand#5'
          AND CAST(ROUND(l_quantity * 100) AS BIGINT) * 5 * qty_n < qty_sum
    """,
    doc="TPC-H Q17-shaped small-quantity-order revenue: lines of one "
        "brand whose quantity is below 20% of that part's average. "
        "Written the way distributed engines decorrelate it — the "
        "per-part average is ONE pre-aggregation of the fact joined "
        "back on partkey (shuffle is |parts|-sized), never a per-row "
        "correlated re-scan — AND the textbook semi-filter: only brand "
        "parts' averages are ever consumed, so BOTH the pre-agg input "
        "and the outer side broadcast-semi-join to the brand's "
        "partkeys first, shrinking the pre-agg shuffle by the brand "
        "selectivity (~1/25). The filter is on partkey, so a brand "
        "part keeps every one of its lineitem rows and its average is "
        "bit-identical (the oracle pre-aggregates unfiltered — same "
        "result, the consumed rows agree). The threshold compares "
        "EXACTLY in integers (qty_cents * 5 * n < sum_cents), immune "
        "to float summation order.",
)
def ext_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    qty_cents = F.round(F.col("l_quantity") * 100, 0).cast("bigint")
    brand_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#5")
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            qty_cents.alias("_qc"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("bigint")
            .alias("_pc"),
        )
        .join(
            F.broadcast(brand_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
    )
    pa = li.groupBy("l_partkey").agg(
        F.sum("_qc").cast("bigint").alias("_qty_sum"),
        F.count(F.lit(1)).alias("_qty_n"),
    )
    return (
        li.join(pa.withColumnRenamed("l_partkey", "_pa_key"),
                F.col("l_partkey") == F.col("_pa_key"))
        .filter(F.col("_qc") * 5 * F.col("_qty_n") < F.col("_qty_sum"))
        .agg(
            (F.sum("_pc") / F.lit(100.0)).alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Round-6 widening: the eight remaining TPC-H query shapes (Q2, Q9, Q11,
# Q12, Q15, Q16, Q20, Q21), completing the 22-query family. The schema
# has no partsupp table, so the five shapes that consume it (Q2/Q9/Q11/
# Q16/Q20) derive the part-supplier relation from lineitem history via
# _derived_partsupp below — the supply CATALOG a warehouse would
# maintain, reconstructed from the fact table with one aggregate.
# ---------------------------------------------------------------------------

#: derived stand-in for TPC-H partsupp: one row per (partkey, suppkey)
#: pair observed in lineitem, with unit cost = min observed
#: price-per-unit in exact cents (division is IEEE-exact and identical
#: on both engines) and qty = total units shipped. Its SQL twin is the
#: `ps` CTE repeated literally in each consuming oracle.
_PS_SQL = """
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               CAST(MIN(CAST(ROUND(l_extendedprice / l_quantity * 100)
                             AS BIGINT)) AS BIGINT) AS ps_cost_cents,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                   AS ps_qty
        FROM lineitem GROUP BY 1, 2
"""


def _derived_partsupp(
    spark: SparkSession, sf_dir: str, lineitem: DataFrame | None = None
) -> DataFrame:
    """``lineitem`` (optional): a pre-filtered lineitem DataFrame — a
    consumer that reduces the fact BEFORE the catalog aggregate (q11's
    ASIA semi push-down) shares this one projection/aggregate
    definition instead of copy-pasting the formulas (round-14 ADVICE:
    a drift in the cents/qty derivation would silently desync the
    semi-filtered catalog from the other partsupp consumers)."""
    unit_cents = F.round(
        F.col("l_extendedprice") / F.col("l_quantity") * 100, 0
    ).cast("bigint")
    return (
        (lineitem if lineitem is not None else _t(spark, sf_dir, "lineitem"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
            unit_cents.alias("_unit_cents"),
            F.round(F.col("l_quantity"), 0).cast("bigint").alias("_qty"),
        )
        .groupBy("ps_partkey", "ps_suppkey")
        .agg(
            F.min("_unit_cents").cast("bigint").alias("ps_cost_cents"),
            F.sum("_qty").cast("bigint").alias("ps_qty"),
        )
    )


def _region_suppliers(spark: SparkSession, sf_dir: str, r_name: str) -> DataFrame:
    """supplier ⨝ nation ⨝ region, filtered to one region — a <=100-row
    dim chain, always broadcast by the caller."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == r_name)
    nr = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


@register(
    "ext_tpch_q2_min_cost_supplier",
    oracle=f"""
        WITH ps AS ({_PS_SQL}),
        s_eu AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ),
        eu_ps AS (
            SELECT ps.*, s_name, s_acctbal, n_name FROM ps
            JOIN s_eu ON ps_suppkey = s_suppkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               ps_cost_cents / 100.0 AS supply_cost
        FROM eu_ps
        JOIN part ON p_partkey = ps_partkey
        WHERE p_type = 'LARGE' AND p_size <= 10
          AND ps_cost_cents = (SELECT MIN(e2.ps_cost_cents) FROM eu_ps e2
                               WHERE e2.ps_partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    doc="TPC-H Q2-shaped minimum-cost supplier: for each LARGE small-"
        "size part, the EUROPE supplier(s) offering the minimum unit "
        "cost (derived partsupp — no partsupp table in this schema; "
        "unit cost = min observed price-per-unit in exact cents). The "
        "correlated MIN subquery decorrelates into ONE min-cost window "
        "over the region-restricted supply relation: supplier/nation/"
        "region chain broadcasts (<=100 rows), the window and the "
        "groupBy share the derived relation, and the part dim "
        "broadcasts into the final filter. Ties on min cost keep all "
        "suppliers, exactly like the reference query.",
)
def ext_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    parts = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_name")
    )
    ps = _derived_partsupp(spark, sf_dir)
    # the part filter semi-joins BELOW the window: the per-partkey min
    # is independent across partkeys, so dropping never-output partkeys
    # first shrinks the window's shuffle/sort input by the part-filter
    # selectivity (~8x here) with an identical result (review find)
    s_eu = _region_suppliers(spark, sf_dir, "EUROPE")
    eu_ps = (
        ps.join(F.broadcast(s_eu),
                F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(parts.select("p_partkey")),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
    )
    w = Window.partitionBy("ps_partkey")
    best = eu_ps.withColumn(
        "_min_cents", F.min("ps_cost_cents").over(w)
    ).filter(F.col("ps_cost_cents") == F.col("_min_cents"))
    return (
        best.join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            (F.col("ps_cost_cents") / F.lit(100.0)).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "ext_tpch_q9_product_type_profit",
    oracle="""
        SELECT n_name, o_year,
               CAST(SUM(amount_cents) AS BIGINT) / 100.0 AS sum_profit
        FROM (
            SELECT n_name,
                   CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   CAST(ROUND((l_extendedprice * (1 - l_discount)
                               - 0.6 * p_retailprice * l_quantity) * 100)
                        AS BIGINT) AS amount_cents
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN orders   ON o_orderkey = l_orderkey
            WHERE p_name LIKE '%gear%'
        ) profit
        GROUP BY n_name, o_year
        ORDER BY n_name, o_year DESC
    """,
    doc="TPC-H Q9-shaped product-type profit by supplier nation and "
        "order year. No partsupp supplycost exists, so cost adapts to "
        "60% of the part's retail price (the classic gross-margin "
        "stand-in); profit = revenue - cost in exact cents with the "
        "SAME left-associated IEEE expression on both engines. Plan: "
        "the filtered part dim (~13% of 2k rows), supplier, and nation "
        "all broadcast; the only big-big join is lineitem ⨝ orders on "
        "orderkey, then one hash aggregate on (nation, year) with "
        "map-side partials. Round 14: that join is SHUFFLE_HASH-hinted "
        "past broadcast scale (size-gated on orders' disk bytes, the "
        "q21 pattern) — neither fact side is sorted; local A/B "
        "marginal (2.56 vs 2.66s median at 100x, bench_q9_ab.py), "
        "shipped on the sort-removal structural argument.",
)
def ext_tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount_cents = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100,
        0,
    ).cast("bigint")
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", amount_cents.alias("_cents"), "n_name")
    )
    # round 14: shuffled-hash instead of sort-merge for the one big-big
    # join (guide §3.1) — builds the 2-column orders projection per
    # partition and sorts NEITHER side. Same size-gate-from-below as
    # q21: only hint past broadcast scale, where the unhinted plan
    # degrades to the sorted SMJ. Honest local A/B (bench_q9_ab.py,
    # interleaved fresh-JVM pairs at 100x): 2/1/1 win/tie/loss,
    # medians 2.56 vs 2.66s, pooled mins 2.37 vs 2.50 — a marginal
    # local win; shipped on the structural argument that the deleted
    # per-partition sorts are O(n log n) state that grows with
    # partition size while the hash build is the smaller projection
    # (the q21 rework measured the same sort removal at -45% where the
    # sort was the wall).
    if _table_disk_bytes(sf_dir, "orders") >= (32 << 20):
        orders = orders.hint("shuffle_hash")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg((F.sum("_cents").cast("bigint") / F.lit(100.0)).alias("sum_profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


@register(
    "ext_tpch_q11_important_parts",
    oracle=f"""
        WITH ps AS ({_PS_SQL}),
        asia_ps AS (
            SELECT ps.* FROM ps
            JOIN supplier ON ps_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        ),
        val AS (
            SELECT ps_partkey AS p_partkey,
                   CAST(SUM(ps_cost_cents * ps_qty) AS BIGINT) AS value_cents
            FROM asia_ps GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM val)
        SELECT p_partkey, value_cents / 100.0 AS part_value
        FROM val, tot
        WHERE value_cents * 1000 > total_cents
        ORDER BY value_cents DESC, p_partkey
    """,
    doc="TPC-H Q11-shaped important-stock identification: parts whose "
        "ASIA-supplied inventory value (derived partsupp cost × qty, "
        "exact integer cents) exceeds 0.1% of the region's total. The "
        "HAVING-vs-scalar-subquery becomes one per-part aggregate plus "
        "a 1-row grand-total broadcast compared in exact integers "
        "(value_cents * 1000 > total_cents — no float fraction). "
        "Round 13 (guide §3.2 — reduce the big side before shuffling "
        "it): the ASIA supplier filter is on ps_suppkey, a GROUPING "
        "key of the derived catalog, so it pushes below the "
        "(partkey, suppkey) aggregate as a broadcast left_semi on the "
        "lineitem scan — every surviving group aggregates exactly the "
        "same rows (min/sum unchanged), but ~4/5 of the fact never "
        "enters the aggregate (5 regions, uniform suppliers): the "
        "catalog aggregate alone measured 4.62s full vs 2.15s pushed "
        "at 100x, full query 4.21s -> 2.24s solo "
        "(scripts/bench_q11_ab.py, value-identity asserted).",
)
def ext_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    s_asia = _region_suppliers(spark, sf_dir, "ASIA").select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(s_asia),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    # the two-level aggregate shape of the derived catalog is kept
    # (MIN unit cost is per PAIR); only its INPUT shrinks — the
    # projection/aggregate definition is _derived_partsupp's own
    # (round-14 ADVICE dedup)
    ps = _derived_partsupp(spark, sf_dir, lineitem=li)
    val = ps.groupBy(F.col("ps_partkey").alias("p_partkey")).agg(
        F.sum(F.col("ps_cost_cents") * F.col("ps_qty"))
        .cast("bigint")
        .alias("value_cents")
    )
    tot = val.agg(F.sum("value_cents").cast("bigint").alias("_total_cents"))
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("value_cents") * 1000 > F.col("_total_cents"))
        .select(
            "p_partkey", (F.col("value_cents") / F.lit(100.0)).alias("part_value")
        )
        .orderBy(F.desc("value_cents"), "p_partkey")
    )


@register(
    "ext_tpch_q12_late_priority_lines",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                   AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="TPC-H Q12-shaped late-line priority split: lines shipped >=30 "
        "days after their order date in 1997, classified by return "
        "flag (the schema has no shipmode column) into high- vs "
        "low-priority order counts via conditional sums in ONE "
        "aggregate pass. The year range pushes to the lineitem scan; "
        "the lateness conjunct evaluates on join matches; one shuffle "
        "on orderkey, one tiny agg on the 3-value flag.",
)
def ext_tpch_q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.expr("o_orderdate + INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "ext_tpch_q15_top_supplier",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) AS BIGINT)
                       AS total_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
              AND l_suppkey IS NOT NULL
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_cents / 100.0 AS total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
        ORDER BY s_suppkey
    """,
    doc="TPC-H Q15-shaped top supplier: the supplier(s) with maximum "
        "revenue over 1996Q1, revenue in exact integer cents so the "
        "max-equality is float-safe. The view + scalar-subquery shape "
        "becomes one per-supplier aggregate reused twice: a 1-row MAX "
        "broadcast joined back against the same aggregate (no global "
        "window — a single-partition sort never appears), then the "
        "<=|suppliers| winners broadcast-join the supplier dim. Ties "
        "keep every winning supplier, as the reference view does.",
)
def ext_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev_cents = _revenue_cents()
    # the explicit suppkey null filter (semantically free: the supplier
    # join drops a NULL group anyway, and the oracle carries the same
    # predicate) makes BOTH consumers' aggregate subtrees identical
    # below the suppkey exchange, so AQE's ReuseExchange computes the
    # per-supplier aggregate ONCE — without it, the main branch gains a
    # join-derived isnotnull the max branch lacks and the fact is
    # scanned and aggregated twice (verified on the executed plan)
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
            & F.col("l_suppkey").isNotNull()
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev_cents).cast("bigint").alias("total_cents"))
    )
    top = rev.agg(F.max("total_cents").alias("_max_cents"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("total_cents") == F.col("_max_cents"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            (F.col("total_cents") / F.lit(100.0)).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "ext_tpch_q16_supplier_part_counts",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        )
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM pairs
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16-shaped supplier diversity count: distinct suppliers "
        "able to supply each (brand, type, size) combination, from the "
        "derived supply pairs (DISTINCT partkey/suppkey over lineitem "
        "— no partsupp table), excluding one brand, one type family, "
        "and suppliers with negative balances (the 'customer "
        "complaints' stand-in; the schema has no s_comment). The NOT "
        "IN becomes a broadcast left_anti on the tiny flagged-supplier "
        "set (safe: s_suppkey is never NULL); part filters broadcast; "
        "COUNT(DISTINCT) runs as Spark's two-phase partial-distinct "
        "aggregate, never a single-node set.",
)
def ext_tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    flagged = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    parts = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        pairs.join(
            F.broadcast(flagged),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "ext_tpch_q20_excess_stock_suppliers",
    oracle="""
        WITH shipped AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                       AS qty
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'blue%'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey, l_partkey
        )
        SELECT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA'
          AND s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 40)
        ORDER BY s_suppkey
    """,
    doc="TPC-H Q20-shaped excess-stock suppliers: AMERICA suppliers "
        "who moved >40 units of some blue part during 1997 (the "
        "availqty-vs-half-of-shipped predicate adapts to a per-"
        "(supplier, part) shipped-quantity threshold — no partsupp "
        "availqty exists). The nested IN chain becomes: blue partkeys "
        "broadcast-semi into lineitem, one (suppkey, partkey) "
        "aggregate, HAVING, then a left_semi into the broadcast "
        "supplier/nation/region chain. Quantities are exact integers; "
        "every join is key-equi.",
)
def ext_tpch_q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    blue = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    shippers = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(blue),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.round(F.col("l_quantity"), 0).cast("bigint"))
             .cast("bigint").alias("_qty"))
        .filter(F.col("_qty") > 40)
        .select("l_suppkey")
    )
    return (
        _region_suppliers(spark, sf_dir, "AMERICA")
        .join(shippers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "ext_tpch_q21_waiting_suppliers",
    oracle="""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE r_name = 'ASIA' AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate >
                                orders.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    doc="TPC-H Q21-shaped waiting suppliers: ASIA suppliers whose late "
        "line (shipped >60 days after order date — the lateness "
        "definition shared with Q4; no commitdate/receiptdate exists) "
        "was the ONLY late one on a finished multi-supplier order. "
        "The EXISTS / NOT EXISTS pair decorrelates into per-order "
        "predicates over the SAME orderkey partition the join just "
        "shuffled on — one pass over the fact-fact join, no "
        "aggregate-plus-join-back re-computation of it. Round 11: the "
        "two collect_set windows (object-buffer aggregates, outside "
        "codegen) are replaced by four MIN/MAX windows in ONE "
        "WindowExec using the distinct-count identities |S| > 1 iff "
        "min(S) != max(S) and |S| = 1 iff min(S) = max(S) (non-empty "
        "by the row's own lateness) — 5.35s -> 3.87s at 100x, "
        "value-identical by theorem and oracle. A late line "
        "qualifies iff the order has another supplier and every late "
        "line shares this line's supplier. Counts rows per supplier "
        "exactly as the reference's l1 multiplicity does. The oracle "
        "keeps the literal EXISTS form so DuckDB derives the answer "
        "independently; the supplier/nation/region chain broadcasts. "
        "Round-12 stage probes (scripts/bench_q21_ab.py, fresh JVM "
        "per variant at 100x): li scan 0.43s + F-orders scan 0.25s; "
        "the li x F-orders SMJ ALONE measures 5.5s median — at the "
        "full query's own wall — and the groupBy(l_orderkey) "
        "SortAggregate rework over the SAME SMJ was a wash. Round 14 "
        "(guide §3.1): the wash diagnosis was incomplete — the cost "
        "was the SMJ's two SORTS, not the window buffers. Shipped "
        "form = SHUFFLE_HASH hint on the F-orders side (narrower "
        "projection builds per partition, nothing is sorted) + the "
        "conditional aggregate, which over unsorted SHJ output plans "
        "as a HashAggregate riding the join's partitioning: a "
        "qualifying order's late lines all share one supplier, so "
        "each order collapses to (late_supplier, n_late) and numwait "
        "= SUM(n_late) — value-identical to counting l1 rows (r12 "
        "identity A/B + oracle). Interleaved fresh-JVM A/B at 100x "
        "(round 14): window/agg-SMJ/agg-SHJ 6.95/4.14/3.80s medians, "
        "pooled mins 4.33/3.98/3.66; join-alone smj 3.4-3.9 vs shj "
        "3.0-3.2. Plan: SortMergeJoin + 2 Sort + Window -> "
        "ShuffledHashJoin BuildRight + HashAggregate; DuckDB does the "
        "whole query in ~1.4s shared-memory — the residual is the "
        "materialized two-fact shuffle, the distributed-engine tax.",
)
def ext_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    # round 14: SHUFFLE_HASH on the F-orders side — the SMJ sorted
    # BOTH shuffled sides (the 3-col lineitem projection and the
    # 2-col F-orders projection) just to feed a window that only
    # needed per-orderkey grouping; a shuffled hash join builds the
    # NARROWER side (F-orders: ~8/10 the rows at ~half the width of
    # the li side) per partition and sorts nothing. Scale-safe where
    # the SMJ itself is feasible: the build is one partition's slice
    # of the smaller projection (partition count scales with data
    # via spark.sql.shuffle.partitions + AQE), orderkeys are
    # uniform, and AQE skew-join splitting applies to SHJ as well.
    # SIZE-GATED from below (the q7 supplier-gate pattern, inverted):
    # a join hint overrides the auto-broadcast path too, and at small
    # inputs (sf0.1: 2.6 MB orders) the F-orders projection broadcasts
    # for free — only hint once orders is provably past broadcast size
    # on disk, where the unhinted plan degrades to the sorted SMJ.
    if _table_disk_bytes(sf_dir, "orders") >= (32 << 20):
        orders = orders.hint("shuffle_hash")
    lo = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "_late",
            F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "_late")
    )
    # round 14 (verdict item 1): the four per-order MIN/MAX windows
    # collapse into ONE groupBy(l_orderkey) conditional aggregate — a
    # qualifying order's late lines all share one supplier (min_ls ==
    # max_ls), so the order reduces to (late_supplier = min_ls, n_late)
    # with no 60M-row pass-through emission and no join-back; numwait =
    # SUM(n_late), value-identical to counting the late lines (r12 A/B
    # asserted identity vs the oracle). Riding the UNSORTED SHJ output
    # this plans as a HashAggregate on the join's partitioning — with
    # the SMJ it planned as a SortAggregate and measured a wash (the
    # sorts were the cost, not the window buffers: see
    # scripts/bench_q21_ab.py round-14 numbers — interleaved A/B
    # window/agg/agg_shj 6.95/4.14/3.80s, pooled mins 4.33/3.98/3.66).
    late_s = F.when(F.col("_late"), F.col("l_suppkey"))
    per_order = (
        lo.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("_min_s"),
            F.max("l_suppkey").alias("_max_s"),
            F.min(late_s).alias("_min_ls"),
            F.max(late_s).alias("_max_ls"),
            F.sum(F.when(F.col("_late"), F.lit(1)).otherwise(F.lit(0)))
            .alias("_n_late"),
        )
        .filter(
            (F.col("_min_s") != F.col("_max_s"))
            & F.col("_min_ls").isNotNull()
            & (F.col("_min_ls") == F.col("_max_ls"))
        )
    )
    asia = _region_suppliers(spark, sf_dir, "ASIA").select("s_suppkey", "s_name")
    waiting = per_order.join(
        F.broadcast(asia), F.col("_min_ls") == F.col("s_suppkey")
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.sum("_n_late").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "x_text_lm_score",
    oracle=r"""
        WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents
            WHERE text IS NOT NULL
              AND len(string_split_regex(trim(text), '\s+')) >= 2
        ), bi AS (
            SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i + 1] AS bg
            FROM tok, unnest(range(1, len(t))) AS r(i)
        ), big AS (
            SELECT bg, COUNT(*) AS c12 FROM bi GROUP BY 1
        ), uni AS (
            SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1
        ), voc AS (
            SELECT COUNT(DISTINCT x) AS v
            FROM (SELECT unnest(t) AS x FROM tok)
        ), scored AS (
            SELECT doc_id,
                   CAST(ROUND(-ln((c12 + 1.0) / (c1 + v)) * 1000000.0)
                        AS BIGINT) AS nll
            FROM bi JOIN big USING (bg) JOIN uni USING (w1), voc
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(nll) AS BIGINT) AS nll_micro_sum,
               ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
                   AS avg_nll
        FROM scored GROUP BY doc_id
    """,
    doc="Corpus-trained bigram LM quality scoring "
        "(operators/text_analysis.py lm_score_bigram) — the CCNet/"
        "Gopher-style perplexity filter: add-one-smoothed bigram model "
        "trained on the corpus, each document scored by average NLL. "
        "Hash-exact across engines because each bigram's NLL is rounded "
        "to integer MICRO-nats before summation (integer sums are "
        "immune to float summation order); the probability itself is "
        "one double division of exact integer counts. Model tables are "
        "hash aggregates with map-side partials; scoring is two shuffle "
        "joins on the model keys + a 1-row vocabulary broadcast.",
)
def x_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import lm_score_bigram

    docs = _t(spark, sf_dir, "documents")
    return lm_score_bigram(docs)


@register(
    "x_text_entropy",
    oracle=r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS tk
            FROM documents WHERE text IS NOT NULL
        ), cnt AS (
            SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY 1, 2
        ), agg AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
                   CAST(SUM(CAST(ROUND(1000000.0 * c * ln(c)) AS BIGINT))
                        AS BIGINT) AS s
            FROM cnt GROUP BY 1
        )
        SELECT doc_id, n_tokens, distinct_tokens,
               CAST(ROUND(1000000.0 * ln(n_tokens)
                          - CAST(s AS DOUBLE) / n_tokens) AS BIGINT)
                   AS entropy_micro
        FROM agg
    """,
    doc="Per-document token-distribution Shannon entropy in integer "
        "micro-nats (operators/text_analysis.py token_entropy) — the "
        "model-free gibberish/boilerplate quality signal beside "
        "repetition_signals and the bigram-LM score. Hash-exact across "
        "engines: each c·ln(c) term is rounded to integer micro-nats "
        "before an integer sum (immune to summation order); the final "
        "value is one double op over two exact integers.",
)
def x_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import token_entropy

    docs = _t(spark, sf_dir, "documents")
    return token_entropy(docs)


@register(
    "x_dataset_split_leakage_safe",
    # same recursive-CTE transitive closure as x_dedup_clusters, then
    # the ext_dataset_split md5 bucket applied to the GROUP id. The
    # quadratic Jaccard stage runs over exact-text REPRESENTATIVES
    # (min doc_id per distinct text) with copy→rep edges re-attaching
    # the exact duplicates: a doc's shingle set is a function of its
    # text, so Jaccard edges between same-text docs are Jaccard-1
    # (present) and cross-text edges are identical for every copy —
    # the components over this reduced graph are PROVABLY the same as
    # over the full pair graph, while candidate pairs shrink by the
    # duplication factor squared (a replicated corpus at 100× went from
    # a 1.4e8-pair join to 1.4e4).
    oracle=r"""
        WITH RECURSIVE reps AS MATERIALIZED (
            SELECT MIN(doc_id) AS doc_id, text
            FROM documents GROUP BY text
        ), docs AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM reps
        ), sh AS (
            SELECT doc_id, unnest(list_distinct(
                list_transform(range(1, greatest(len(toks) - 1, 1)),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            )) AS shingle
            FROM docs WHERE len(toks) >= 3
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        ), cand AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), jac AS (
            SELECT p.doc_a, p.doc_b
            FROM cand p JOIN sizes sa ON p.doc_a = sa.doc_id
                        JOIN sizes sb ON p.doc_b = sb.doc_id
            WHERE CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) >= 0.3
        ), copy_edges AS MATERIALIZED (
            SELECT r.doc_id AS a, d.doc_id AS b
            FROM documents d JOIN reps r ON d.text = r.text
            WHERE d.doc_id <> r.doc_id
        ), edges AS (
            SELECT doc_a AS a, doc_b AS b FROM jac
            UNION ALL
            SELECT doc_b, doc_a FROM jac
            UNION ALL
            SELECT a, b FROM copy_edges
            UNION ALL
            SELECT b, a FROM copy_edges
        ), cc_nodes AS (
            SELECT DISTINCT a AS id FROM edges
        ), reach(id, r) AS (
            SELECT id, id FROM cc_nodes
            UNION
            SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a
        ), comp AS (
            SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
        ), grp AS (
            SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS group_id
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
        ), b AS (
            SELECT doc_id, group_id,
                   CAST(concat('0x', substring(md5(CAST(group_id AS VARCHAR)),
                                               1, 4)) AS INTEGER) AS bucket
            FROM grp
        )
        SELECT doc_id, group_id, bucket,
               CASE WHEN bucket < 52429 THEN 'train'
                    WHEN bucket < 58982 THEN 'val'
                    ELSE 'test' END AS split
        FROM b ORDER BY doc_id
    """,
    doc="Leakage-safe train/val/test split (operators/splits.py "
        "leakage_safe_split): n-gram-Jaccard near-dup pairs collapse "
        "into connected components, every document hash-buckets by its "
        "GROUP id — near-duplicate groups can never straddle the "
        "train/test boundary (the evaluation-contamination bug of "
        "row-id splits). Singletons land exactly where ext_dataset_split "
        "puts them, so adopting leakage safety never reshuffles the "
        "un-duplicated majority.",
)
def x_dataset_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.dedup import ngram_jaccard_pairs
    from data_wrangling_spark.operators.splits import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    # exact-duplicate collapse before the quadratic stage (see the
    # oracle comment for the equivalence argument): Jaccard pairs run
    # over one representative per distinct text; copy→rep edges carry
    # the exact duplicates into the same components
    reps = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    rep_pairs = ngram_jaccard_pairs(
        reps, "doc_id", "text", n=3, threshold=0.3
    ).select("doc_a", "doc_b")
    copy_edges = (
        docs.join(
            reps.select(F.col("text"), F.col("doc_id").alias("_rep")), "text"
        )
        .filter(F.col("doc_id") != F.col("_rep"))
        .select(F.col("_rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    pairs = rep_pairs.unionByName(copy_edges)
    out = leakage_safe_split(
        docs, "doc_id", pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.select("doc_id", "group_id", "bucket", "split").orderBy("doc_id")


@register(
    "x_text_novelty",
    oracle=r"""
        WITH docs AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents WHERE text IS NOT NULL
        ), sh AS (
            SELECT doc_id, unnest(list_distinct(
                list_transform(range(1, greatest(len(toks) - 1, 1)),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            )) AS shingle
            FROM docs WHERE len(toks) >= 3
        ), first AS (
            SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1
        )
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               CAST(ROUND(1000000.0 *
                          SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                          / COUNT(*)) AS BIGINT) AS novelty_ppm
        FROM sh s JOIN first f ON s.shingle = f.shingle
        GROUP BY s.doc_id ORDER BY s.doc_id
    """,
    doc="Per-document shingle novelty in integer ppm (operators/"
        "text_analysis.py shingle_novelty): the fraction of a doc's "
        "distinct trigram shingles first seen (min doc_id) in that doc "
        "— the redundancy/curriculum signal; late near-copies score ~0. "
        "Explode → distinct postings → shingle-keyed min(id) joined "
        "back; shuffles bounded by the posting count.",
)
def x_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import shingle_novelty

    docs = _t(spark, sf_dir, "documents")
    return shingle_novelty(docs).orderBy("doc_id")


@register(
    "x_text_boilerplate_removal",
    oracle=r"""
        WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents WHERE text IS NOT NULL
        ), seg AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
                       i -> struct_pack(
                           i := i,
                           s := array_to_string(
                               list_slice(toks, i * 8 + 1, i * 8 + 8), ' ')))) AS u
            FROM tok
        ), srows AS (
            SELECT doc_id, u.i AS seg_idx, u.s AS seg FROM seg
        ), freq AS (
            SELECT seg, COUNT(*) AS df
            FROM (SELECT DISTINCT doc_id, seg FROM srows) GROUP BY seg
        ), kept AS (
            SELECT r.doc_id, r.seg_idx, r.seg
            FROM srows r JOIN freq f ON r.seg = f.seg WHERE f.df < 2
        ), kept_agg AS (
            SELECT doc_id, COUNT(*) AS n_kept,
                   string_agg(seg, ' ' ORDER BY seg_idx) AS cleaned
            FROM kept GROUP BY doc_id
        ), totals AS (
            SELECT doc_id, COUNT(*) AS n_segments FROM srows GROUP BY doc_id
        )
        SELECT t.doc_id, CAST(t.n_segments AS BIGINT) AS n_segments,
               CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
               COALESCE(k.cleaned, '') AS cleaned_text
        FROM totals t LEFT JOIN kept_agg k USING (doc_id)
        ORDER BY t.doc_id
    """,
    doc="CCNet-style boilerplate REMOVAL with document reassembly "
        "(operators/text_analysis.py boilerplate_removal): consecutive "
        "8-token segments, corpus document frequency per segment, "
        "segments in >= 2 docs dropped, documents rebuilt from the "
        "survivors in original order (array_sort on (position, segment) "
        "structs — deterministic under any partitioning). The transform "
        "counterpart of x_text_boilerplate_spans: what a curation "
        "pipeline actually runs before training. Segmentation is a "
        "narrow projection; df is one distinct+agg; reassembly is one "
        "per-doc agg with doc-bounded state.",
)
def x_text_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import boilerplate_removal

    docs = _t(spark, sf_dir, "documents")
    return boilerplate_removal(docs, seg_tokens=8, min_docs=2).orderBy("doc_id")


@register(
    "x_text_quality_classifier",
    oracle=r"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tk
            FROM documents WHERE text IS NOT NULL
        ), w AS (
            SELECT doc_id,
                   ((CAST(concat('0x', substring(md5(tk), 1, 4)) AS BIGINT)
                     % 4096) * 2654435761) % 2001 - 1000 AS w
            FROM tok
        ), agg AS (
            SELECT doc_id, COUNT(*) AS n_tokens, SUM(w) AS s
            FROM w GROUP BY doc_id
        ), sc AS (
            SELECT doc_id, n_tokens,
                   CAST(ROUND(1000.0 * s / n_tokens) AS BIGINT) AS score_milli
            FROM agg
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, score_milli,
               CASE WHEN score_milli > 0 THEN 'keep' ELSE 'drop' END AS label
        FROM sc
    """,
    doc="fastText-shaped hashed linear quality classifier (operators/"
        "text_analysis.py hashed_linear_score): tokens hash into 4096 "
        "feature buckets (engine-portable md5 bucket, splits.py), the "
        "document score is the mean bucket weight in integer milli "
        "(integer sum + one double division — hash-exact), label by "
        "threshold. The registered model is the deterministic Knuth-hash "
        "synthetic weight vector, keeping the plan a ZERO-shuffle "
        "map-only pass (round 13: the md5 bucket + Knuth weight "
        "evaluate inside the token array via HOFs, and the terminal "
        "orderBy(doc_id) presentation sort — whose range-partitioner "
        "sampling re-executed the whole md5 pass — is dropped on BOTH "
        "engines; driver value-hash sorts rows); trained weights plug "
        "in as a broadcast relation of n_buckets rows.",
)
def x_text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import hashed_linear_score

    docs = _t(spark, sf_dir, "documents")
    return hashed_linear_score(docs)


#: shared oracle prefix for the evaluation queries: replay the hashed
#: linear classifier score (the x_text_quality_classifier oracle's CTEs)
#: and attach the weak label lang='en' + the source group key
_EVAL_LABELED_CTES = r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tk
        FROM documents WHERE text IS NOT NULL
    ), w AS (
        SELECT doc_id,
               ((CAST(concat('0x', substring(md5(tk), 1, 4)) AS BIGINT)
                 % 4096) * 2654435761) % 2001 - 1000 AS w
        FROM tok
    ), agg AS (
        SELECT doc_id, COUNT(*) AS n_tokens, SUM(w) AS s
        FROM w GROUP BY doc_id
    ), sc AS (
        SELECT doc_id,
               CAST(ROUND(1000.0 * s / n_tokens) AS BIGINT) AS score_milli
        FROM agg
    ), lab AS (
        SELECT d.source, sc.score_milli,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM sc JOIN documents d ON sc.doc_id = d.doc_id
    )
"""


@register(
    "x_eval_auc_quality",
    oracle=_EVAL_LABELED_CTES + r""", cnt AS (
        SELECT source, score_milli, CAST(SUM(y) AS BIGINT) AS p,
               CAST(SUM(1 - y) AS BIGINT) AS n
        FROM lab GROUP BY 1, 2
    ), cum AS (
        SELECT source, p, n,
               COALESCE(SUM(n) OVER (PARTITION BY source
                   ORDER BY score_milli
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS nb
        FROM cnt
    ), ag AS (
        SELECT source, CAST(SUM(p) AS BIGINT) AS pos,
               CAST(SUM(n) AS BIGINT) AS neg,
               CAST(SUM(p * (2 * nb + n)) AS BIGINT) AS num2
        FROM cum GROUP BY source
    )
    SELECT source, pos AS n_pos, neg AS n_neg,
           CAST(ROUND((1000000.0 * num2) / (2.0 * pos * neg)) AS BIGINT)
               AS auc_micro
    FROM ag WHERE pos > 0 AND neg > 0 ORDER BY source
    """,
    doc="X-TEXT evaluation: exact per-source ROC-AUC (Mann-Whitney with "
        "midrank ties — identical to trapezoidal ROC area) of the hashed "
        "linear quality score against the weak label lang='en'. The "
        "corpus-scale classifier-calibration primitive: one (source, "
        "score) hash aggregate is the ONLY pass over the data; the "
        "cumulative window runs over the per-source DISTINCT-score "
        "table (score-domain bounded, never row-bounded); doubled "
        "integer units make the one final division engine-exact "
        "(operators/evaluation.py).",
)
def x_eval_auc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.evaluation import roc_auc
    from data_wrangling_spark.operators.text_analysis import hashed_linear_score

    # round 13: the label/group columns ride THROUGH the map-only
    # classifier (carry=...) instead of a doc-scale re-attach join —
    # they were in the same row all along
    docs = _t(spark, sf_dir, "documents").withColumn(
        "_y", F.when(F.col("lang") == "en", 1).otherwise(0)
    )
    lab = hashed_linear_score(docs, carry=["source", "_y"]).select(
        "doc_id", "source", "_y", "score_milli"
    )
    return roc_auc(lab, "score_milli", "_y", ["source"]).orderBy("source")


@register(
    "x_eval_pr_sweep",
    oracle=_EVAL_LABELED_CTES + r""", thr AS (
        SELECT unnest([-300, -150, 0, 150, 300]) AS threshold
    ), ag AS (
        SELECT source, threshold,
               CAST(SUM(CASE WHEN score_milli >= threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pred_pos,
               CAST(SUM(CASE WHEN score_milli >= threshold THEN y ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM lab, thr GROUP BY 1, 2
    )
    SELECT source, CAST(threshold AS BIGINT) AS threshold, n_pred_pos, tp,
           CASE WHEN n_pred_pos > 0
                THEN CAST(ROUND((1000000.0 * tp) / n_pred_pos) AS BIGINT)
           END AS precision_micro,
           CASE WHEN pos > 0
                THEN CAST(ROUND((1000000.0 * tp) / pos) AS BIGINT)
           END AS recall_micro,
           CASE WHEN (n_pred_pos + pos) > 0
                THEN CAST(ROUND((2000000.0 * tp) / (n_pred_pos + pos))
                          AS BIGINT)
           END AS f1_micro
    FROM ag ORDER BY source, threshold
    """,
    doc="X-TEXT evaluation: per-source precision/recall/F1 sweep of the "
        "hashed quality score at five fixed thresholds against the weak "
        "label lang='en' — the cutoff-calibration table a curation "
        "pipeline reads before fixing its filter threshold. The (source, "
        "score) vocabulary aggregate is computed ONCE; every threshold "
        "reduces vocabulary rows, so sweeping more thresholds never "
        "re-scans the corpus; degenerate cells keep NULL ratios instead "
        "of vanishing (operators/evaluation.py).",
)
def x_eval_pr_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.evaluation import pr_at_thresholds
    from data_wrangling_spark.operators.text_analysis import hashed_linear_score

    # round 13: the label/group columns ride THROUGH the map-only
    # classifier (carry=...) instead of a doc-scale re-attach join —
    # they were in the same row all along
    docs = _t(spark, sf_dir, "documents").withColumn(
        "_y", F.when(F.col("lang") == "en", 1).otherwise(0)
    )
    lab = hashed_linear_score(docs, carry=["source", "_y"]).select(
        "doc_id", "source", "_y", "score_milli"
    )
    out = pr_at_thresholds(
        lab, "score_milli", "_y", [-300, -150, 0, 150, 300], ["source"]
    )
    return out.withColumn(
        "threshold", F.col("threshold").cast("long")
    ).orderBy("source", "threshold")


@register(
    "x_eval_calibration",
    oracle=_EVAL_LABELED_CTES + r""", bind AS (
        SELECT source,
               LEAST(GREATEST(CAST(FLOOR((score_milli - (-500)) * 10
                                          / 1000.0) AS BIGINT), 0), 9)
                   AS bin,
               score_milli, y
        FROM lab
    ), ag AS (
        SELECT source, bin, COUNT(*) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(score_milli) AS BIGINT) AS ss
        FROM bind GROUP BY 1, 2
    ), mic AS (
        SELECT source, bin,
               CAST(-500 + FLOOR(bin * 1000.0 / 10) AS BIGINT) AS bin_lo,
               n, n_pos,
               CAST(ROUND(1000000.0 * (ss - n * (-500)) / (n * 1000.0))
                    AS BIGINT) AS conf_micro,
               CAST(ROUND(1000000.0 * n_pos / n) AS BIGINT) AS acc_micro
        FROM ag
    )
    SELECT source, bin, bin_lo, n, n_pos, conf_micro, acc_micro,
           ABS(acc_micro - conf_micro) AS gap_micro
    FROM mic ORDER BY source, bin
    """,
    doc="X-TEXT evaluation: per-source reliability table (calibration "
        "bins) of the hashed quality score against the weak label "
        "lang='en' — the third evaluation leg beside AUC (ranking) and "
        "the PR sweep (cutoffs): a perfectly-ranking score can still be "
        "miscalibrated, and a pipeline thresholding on probability-like "
        "scores needs the score→empirical-rate map. Ten uniform bins "
        "over [-500, 500) milli with out-of-range scores clamped to the "
        "edge bins; one (source, bin) hash aggregate is the only corpus "
        "pass; conf/acc in integer micro via one double division each, "
        "gap from the already-rounded micros so ECE replays exactly "
        "(operators/evaluation.py calibration_bins).",
)
def x_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.evaluation import calibration_bins
    from data_wrangling_spark.operators.text_analysis import hashed_linear_score

    # round 13: the label/group columns ride THROUGH the map-only
    # classifier (carry=...) instead of a doc-scale re-attach join —
    # they were in the same row all along
    docs = _t(spark, sf_dir, "documents").withColumn(
        "_y", F.when(F.col("lang") == "en", 1).otherwise(0)
    )
    lab = hashed_linear_score(docs, carry=["source", "_y"]).select(
        "doc_id", "source", "_y", "score_milli"
    )
    return calibration_bins(
        lab, "score_milli", "_y", n_bins=10, lo=-500, hi=500,
        group_cols=["source"],
    ).orderBy("source", "bin")


@register(
    "x_eval_ece",
    oracle=_EVAL_LABELED_CTES + r""", bind AS (
        SELECT source,
               LEAST(GREATEST(CAST(FLOOR((score_milli - (-500)) * 10
                                          / 1000.0) AS BIGINT), 0), 9)
                   AS bin,
               score_milli, y
        FROM lab
    ), ag AS (
        SELECT source, bin, COUNT(*) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(score_milli) AS BIGINT) AS ss
        FROM bind GROUP BY 1, 2
    ), mic AS (
        SELECT source, n,
               ABS(CAST(ROUND(1000000.0 * n_pos / n) AS BIGINT)
                   - CAST(ROUND(1000000.0 * (ss - n * (-500))
                                / (n * 1000.0)) AS BIGINT)) AS gap_micro
        FROM ag
    )
    SELECT source, CAST(SUM(n) AS BIGINT) AS n,
           CAST(ROUND(CAST(SUM(n * gap_micro) AS DOUBLE) / SUM(n))
                AS BIGINT) AS ece_micro
    FROM mic GROUP BY source ORDER BY source
    """,
    doc="X-TEXT evaluation: expected calibration error per source — the "
        "binned-ECE single-number calibration report (Naeini et al. "
        "2015) folded from the x_eval_calibration reliability table: "
        "ECE = Σ_b (n_b/N)·gap_b with gap_b exact integer micro by "
        "construction, so the fold is exact int64 arithmetic plus ONE "
        "final division. Same corpus pass as the bins table; this adds "
        "one control-plane-sized re-aggregate "
        "(operators/evaluation.py calibration_error).",
)
def x_eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.evaluation import calibration_error
    from data_wrangling_spark.operators.text_analysis import hashed_linear_score

    # round 13: the label/group columns ride THROUGH the map-only
    # classifier (carry=...) instead of a doc-scale re-attach join —
    # they were in the same row all along
    docs = _t(spark, sf_dir, "documents").withColumn(
        "_y", F.when(F.col("lang") == "en", 1).otherwise(0)
    )
    lab = hashed_linear_score(docs, carry=["source", "_y"]).select(
        "doc_id", "source", "_y", "score_milli"
    )
    return calibration_error(
        lab, "score_milli", "_y", n_bins=10, lo=-500, hi=500,
        group_cols=["source"],
    ).orderBy("source")


@register(
    "x_eval_brier",
    oracle=_EVAL_LABELED_CTES + r""", r AS (
        SELECT source,
               LEAST(GREATEST(score_milli - (-500), 0), 1000)
                   - 1000 * y AS resid,
               y
        FROM lab
    ), ag AS (
        SELECT source, COUNT(*) AS n,
               CAST(SUM(resid * resid) AS BIGINT) AS sq,
               CAST(SUM(y) AS BIGINT) AS p
        FROM r GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n,
           CAST(ROUND((1000000.0 * sq) / (n * 1000000.0)) AS BIGINT)
               AS brier_micro,
           CAST(ROUND((1000000.0 * p) / n) AS BIGINT) AS base_rate_micro,
           CAST(ROUND((1000000.0 * (p * (n - p))) / (CAST(n AS DOUBLE) * n))
                AS BIGINT) AS brier_ref_micro
    FROM ag ORDER BY source
    """,
    doc="X-TEXT evaluation: per-source Brier score of the hashed "
        "quality score (mapped to p = clamp(score_milli+500, 0, 1000) "
        "/ 1000) against the weak label lang='en' — the PROPER scoring "
        "rule completing the calibration leg: ECE is gamed by a "
        "constant base-rate predictor (calibrated, zero resolution); "
        "Brier penalizes it via the Murphy decomposition. Reported "
        "with the base rate and the reference Brier ȳ(1−ȳ) so the "
        "skill comparison needs no second query. ONE (group) hash "
        "aggregate over codegen integer arithmetic — exact int64 "
        "residual squares, one double division per output "
        "(operators/evaluation.py brier_score, round 11).",
)
def x_eval_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.evaluation import brier_score
    from data_wrangling_spark.operators.text_analysis import hashed_linear_score

    # round 13: the label/group columns ride THROUGH the map-only
    # classifier (carry=...) instead of a doc-scale re-attach join —
    # they were in the same row all along
    docs = _t(spark, sf_dir, "documents").withColumn(
        "_y", F.when(F.col("lang") == "en", 1).otherwise(0)
    )
    lab = hashed_linear_score(docs, carry=["source", "_y"]).select(
        "doc_id", "source", "_y", "score_milli"
    )
    return brier_score(
        lab, "score_milli", "_y", lo=-500, hi=500, group_cols=["source"]
    ).orderBy("source")


@register(
    "x_text_dsir",
    oracle=r"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tk
            FROM documents WHERE text IS NOT NULL
        ), tgt AS (
            SELECT doc_id, (lang = 'en') AS is_t FROM documents
        ), tk2 AS (
            SELECT t.doc_id, g.is_t,
                   (CAST(concat('0x', substring(md5(t.tk), 1, 4)) AS BIGINT)
                    % 1024) AS bucket
            FROM tok t JOIN tgt g USING (doc_id)
        ), counts AS (
            SELECT bucket,
                   CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                   CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cs
            FROM tk2 GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(ct) AS BIGINT) AS nt,
                   CAST(SUM(cs) AS BIGINT) AS ns
            FROM counts
        ), lr AS (
            SELECT bucket,
                   CAST(ROUND(1000000.0 * ln(
                       ((ct + 1) / (nt + 1024.0))
                       / ((cs + 1) / (ns + 1024.0))
                   )) AS BIGINT) AS lr_micro
            FROM counts, tot
        ), sc AS (
            SELECT doc_id, COUNT(*) AS n_tokens,
                   CAST(SUM(lr_micro) AS BIGINT) AS weight_micro
            FROM tk2 JOIN lr USING (bucket) GROUP BY 1
        )
        SELECT d.doc_id, (d.lang = 'en') AS is_target,
               COALESCE(sc.n_tokens, 0) AS n_tokens,
               COALESCE(sc.weight_micro, 0) AS weight_micro,
               CASE WHEN sc.n_tokens > 0
                    THEN CAST(ROUND(CAST(sc.weight_micro AS DOUBLE)
                                    / sc.n_tokens) AS BIGINT) END AS avg_micro,
               CASE WHEN sc.n_tokens > 0
                    THEN (CAST(ROUND(CAST(sc.weight_micro AS DOUBLE)
                                     / sc.n_tokens) AS BIGINT) > 0)
                    ELSE FALSE END AS selected
        FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        ORDER BY d.doc_id
    """,
    doc="X-TEXT data selection: DSIR-style importance weights (Xie et "
        "al. 2023) of every document against the lang='en' target slice "
        "— hashed bag-of-words LMs of target vs rest with add-one "
        "smoothing over 1024 md5 buckets, per-document log weight as an "
        "INTEGER sum of once-rounded micro-nat bucket ratios (summation-"
        "order-immune, engine-exact). One token explode feeds both the "
        "bucket model (<=1024 rows, broadcast back) and the per-doc "
        "scoring aggregate (operators/text_analysis.py dsir_importance "
        "— registered round 10; implemented round 6 but left off the "
        "registry, a coverage hole this row closes). Round 11: "
        "persist_tokens=True — pass 2 reads the cached tokenized "
        "projection instead of re-running explode+md5 (22.1s -> 13.3s "
        "at 100x, scripts/bench_dsir_ab.py; value-hash parity "
        "checked). The timing harness REBUILDS the plan and clears the "
        "cache per timed run (time_suite, fixed round 12 per the "
        "advisor: clearCache() also unregisters the persist, so the "
        "r11-published 21.7s row was the fully-UNCACHED recompute "
        "path, not the persisted one-shot this doc prices; from round "
        "12 the published row is persist registration + cache "
        "write + cached pass 2 — one-shot, never a warm re-run).",
)
def x_text_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import dsir_importance

    docs = _t(spark, sf_dir, "documents")
    return dsir_importance(docs, F.col("lang") == "en", persist_tokens=True)


@register(
    "x_text_collocations",
    oracle=r"""
        WITH tok AS (
            SELECT string_split_regex(trim(text), '\s+') AS toks
            FROM documents WHERE text IS NOT NULL
        ), uni AS (
            SELECT tk, COUNT(*) AS c
            FROM (SELECT unnest(toks) AS tk FROM tok) GROUP BY tk
        ), bgu AS (
            SELECT unnest(list_transform(range(1, len(toks)),
                i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS u
            FROM tok WHERE len(toks) >= 2
        ), bg AS (
            SELECT u.w1 AS w1, u.w2 AS w2, COUNT(*) AS c_ab
            FROM bgu GROUP BY 1, 2
        ), tot AS (
            SELECT (SELECT SUM(c) FROM uni) AS n,
                   (SELECT SUM(c_ab) FROM bg) AS np
        )
        SELECT b.w1, b.w2, CAST(b.c_ab AS BIGINT) AS c_ab,
               CAST(ROUND(1000000.0 * ln(
                   (CAST(b.c_ab AS DOUBLE) / np) /
                   ((CAST(ca.c AS DOUBLE) / n) * (CAST(cb.c AS DOUBLE) / n))
               )) AS BIGINT) AS pmi_micro
        FROM bg b JOIN uni ca ON b.w1 = ca.tk
                  JOIN uni cb ON b.w2 = cb.tk, tot
        WHERE b.c_ab >= 5
        ORDER BY pmi_micro DESC, b.w1, b.w2
    """,
    doc="Corpus bigram collocations by PMI (operators/text_analysis.py "
        "collocations_pmi) — the tokenizer-building / multi-word-"
        "expression signal. Row membership is decided by exact integer "
        "counts alone (c_ab >= 5, no top-k cut on the float); pmi_micro "
        "follows the entropy/lm_score integer-micro-nats discipline "
        "(identical IEEE double inputs to one ln per row). Two "
        "vocabulary-bounded hash aggs + two vocabulary joins + a 1-row "
        "totals broadcast — no posting-level join.",
)
def x_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.text_analysis import collocations_pmi

    docs = _t(spark, sf_dir, "documents")
    return collocations_pmi(docs, min_count=5)


@register(
    "x_corpus_shard_manifest",
    oracle=r"""
        WITH b AS (
            SELECT doc_id,
                   CAST(concat('0x', substring(md5(concat(
                       CAST(doc_id AS VARCHAR), 'shard')), 1, 4)) AS BIGINT)
                       % 64 AS shard,
                   COALESCE(len(string_split_regex(trim(text), '\s+')), 0)
                       AS n_tok,
                   COALESCE(length(text), 0) AS n_chr,
                   COALESCE(CAST(concat('0x', substring(md5(text), 1, 8))
                                 AS BIGINT), 0) AS ck
            FROM documents
        )
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chr) AS BIGINT) AS n_chars,
               MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
               CAST(SUM(ck) AS BIGINT) AS checksum
        FROM b GROUP BY shard ORDER BY shard
    """,
    doc="Deterministic training-shard assignment + manifest (operators/"
        "splits.py shard_manifest): content-keyed md5 shard (stable "
        "under reprocessing/appends — appending never moves existing "
        "docs), per-shard doc/token/char counts, id range, and an "
        "order-insensitive integer checksum (sum of md5 prefixes — "
        "verifiable after any copy without re-reading order). One "
        "narrow projection + one 64-group hash agg with map-side "
        "partials; the manifest is O(shards) rows at any corpus size.",
)
def x_corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.splits import shard_manifest

    docs = _t(spark, sf_dir, "documents")
    return shard_manifest(docs, n_shards=64)


@register(
    "x_corpus_source_cap",
    oracle=r"""
        WITH r AS (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rnk,
                   CAST(concat('0x', substring(md5(concat(
                       CAST(doc_id AS VARCHAR), 'cap')), 1, 4)) AS BIGINT) AS b
            FROM documents
        ), f AS (
            SELECT source, n_chars, (rnk <= 10) AS is_top,
                   (rnk > 10 AND b < 16384) AS is_smp
            FROM r
        )
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN is_top THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
               CAST(SUM(CASE WHEN is_smp THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sampled,
               CAST(SUM(CASE WHEN is_top OR is_smp THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN is_top OR is_smp THEN n_chars ELSE 0 END)
                    AS BIGINT) AS kept_chars
        FROM f GROUP BY source ORDER BY source
    """,
    doc="Per-source corpus balancing (operators/splits.py source_cap): "
        "top-10 docs per source by quality (WindowGroupLimit partial "
        "rank — <= cap rows per source per partition reach the "
        "exchange) plus a 25% content-keyed md5 hash sample of the "
        "tail (pure integer bucket compare, stable under reprocessing "
        "unlike rand() sampling); one accounting row per source. The "
        "guard against one crawl domain swamping the training mixture.",
)
def x_corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.splits import source_cap

    docs = _t(spark, sf_dir, "documents")
    return source_cap(docs, cap=10, tail_keep_ppm=250000)


@register(
    "x_vec_outliers",
    oracle=r"""
        WITH q AS (
            SELECT label, vec_id,
                   list_transform(embedding,
                       x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS qv
            FROM embeddings WHERE embedding IS NOT NULL
        ), pos AS (
            SELECT label, vec_id, u.d AS d, u.v AS v
            FROM (
                SELECT label, vec_id,
                       unnest(list_transform(range(1, len(qv) + 1),
                           i -> struct_pack(d := i, v := qv[i]))) AS u
                FROM q
            )
        ), sums AS (
            SELECT label, d, SUM(v) AS s, COUNT(*) AS n
            FROM pos GROUP BY 1, 2
        ), cent AS (
            SELECT label, d,
                   CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) AS c
            FROM sums
        ), dist AS (
            SELECT p.label, p.vec_id,
                   CAST(SUM((p.v - c.c) * (p.v - c.c)) AS BIGINT) AS dist2
            FROM pos p JOIN cent c ON p.label = c.label AND p.d = c.d
            GROUP BY 1, 2
        ), rk AS (
            SELECT label, vec_id, dist2,
                   row_number() OVER (PARTITION BY label
                                      ORDER BY dist2 DESC, vec_id) AS rnk
            FROM dist
        )
        SELECT label, vec_id, dist2, CAST(rnk AS INT) AS rnk
        FROM rk WHERE rnk <= 5 ORDER BY label, rnk
    """,
    doc="Per-label embedding outliers (operators/similarity.py "
        "embedding_outliers): top-5 vectors farthest (squared L2) from "
        "their label centroid — the mislabeled-example / junk-embedding "
        "audit. x_dedup_semantic's exact-integer discipline end to end "
        "(micro-quantization, floor(sum/count) centroids via one IEEE "
        "division, pure-int64 distances), so the DuckDB oracle is an "
        "independent re-derivation, not a pinned golden. Centroid pass "
        "shuffles labels*dims rows; centroids broadcast back; distance "
        "is a narrow zip_with; top-k is WindowGroupLimit partial rank.",
)
def x_vec_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.similarity import embedding_outliers

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_outliers(emb, top_k=5)


@register(
    "ext_funnel_steps",
    oracle="""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t
            GROUP BY e.user_id
        ), c AS (
            SELECT 1 AS step_idx, 'view' AS step,
                   (SELECT COUNT(*) FROM s1) AS n_users
            UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
            UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
        )
        SELECT step_idx, step, CAST(n_users AS BIGINT) AS n_users,
               CAST(CASE
                   WHEN step_idx = 1 THEN 1000000
                   WHEN lag(n_users) OVER (ORDER BY step_idx) = 0 THEN 0
                   ELSE ROUND(1000000.0 * n_users
                              / lag(n_users) OVER (ORDER BY step_idx))
               END AS BIGINT) AS conv_ppm
        FROM c ORDER BY step_idx
    """,
    doc="Ordered funnel analysis (operators/temporal.py funnel_steps): "
        "users completing view -> click -> purchase where each step "
        "must occur strictly AFTER the user's first completion of the "
        "previous step (a purchase before the first click does not "
        "convert — the semantics a naive per-type count gets wrong). "
        "One lazy plan: per step a filtered user-keyed min(ts) hash "
        "aggregate joined to the shrinking survivor set; the lag window "
        "runs over O(steps) rows, never the event stream. Round-13 "
        "probe (scripts/bench_funnel_ab.py, 100x solo): shipped 2.86s; "
        "the step-1 aggregate ALONE is 1.30s (events scan 0.36s) and "
        "the three chained stages cannot beat ~2x that floor — fusing "
        "all steps onto one user-keyed exchange measured 2.64s (a "
        "wash, within spread) and persisting the per-step user sets "
        "measured WORSE (4.46s: three tiny cache builds serialize the "
        "chain), so the lazy chain stays.",
)
def ext_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.temporal import funnel_steps

    events = _t(spark, sf_dir, "events")
    return funnel_steps(events, ["view", "click", "purchase"])


@register(
    "ext_cohort_retention",
    oracle="""
        WITH first AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
            FROM events GROUP BY user_id
        ), active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS week
            FROM events
        ), sizes AS (
            SELECT cohort, COUNT(*) AS n_cohort FROM first GROUP BY cohort
        ), cells AS (
            SELECT f.cohort,
                   CAST(date_diff('day', f.cohort, a.week) // 7 AS INT)
                       AS week_offset,
                   COUNT(*) AS n_active
            FROM active a JOIN first f ON a.user_id = f.user_id
            GROUP BY 1, 2
        )
        SELECT c.cohort AS cohort_week, c.week_offset,
               CAST(c.n_active AS BIGINT) AS n_active,
               CAST(s.n_cohort AS BIGINT) AS n_cohort,
               CAST(ROUND(1000000.0 * c.n_active / s.n_cohort) AS BIGINT)
                   AS retention_ppm
        FROM cells c JOIN sizes s ON c.cohort = s.cohort
        ORDER BY cohort_week, week_offset
    """,
    doc="Weekly cohort retention matrix (operators/temporal.py "
        "cohort_retention): users cohort by the Monday week of their "
        "first event; later active weeks fill the retention cells in "
        "integer ppm. Round-13 shape: ONE event-scale exchange — the "
        "narrow (user, week) projection repartitions by user, the "
        "distinct rides that exchange, its output persists (users x "
        "weeks rows), and the first-event table is min(week) derived "
        "from it (date_trunc monotonic => value-identical); attach "
        "join + matrix aggregate read the cached set. 4.39s -> 2.26s "
        "at 100x (scripts/bench_cohort_ab.py). No window over the "
        "event stream.",
)
def ext_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.temporal import cohort_retention

    events = _t(spark, sf_dir, "events")
    return cohort_retention(events)


@register(
    "ext_table_profile",
    oracle="""
        WITH one AS (
            SELECT COUNT(*) AS n_rows,
                   SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS k_n,
                   COUNT(DISTINCT CAST(o_orderkey AS VARCHAR)) AS k_d,
                   MIN(CAST(o_orderkey AS VARCHAR)) AS k_mn,
                   MAX(CAST(o_orderkey AS VARCHAR)) AS k_mx,
                   SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS s_n,
                   COUNT(DISTINCT o_orderstatus) AS s_d,
                   MIN(o_orderstatus) AS s_mn, MAX(o_orderstatus) AS s_mx,
                   SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS p_n,
                   COUNT(DISTINCT CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                       AS VARCHAR)) AS p_d,
                   MIN(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR)) AS p_mn,
                   MAX(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR)) AS p_mx,
                   SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS d_n,
                   COUNT(DISTINCT CAST(CAST(o_orderdate AS DATE) AS VARCHAR))
                       AS d_d,
                   MIN(CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) AS d_mn,
                   MAX(CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) AS d_mx
            FROM orders
        )
        SELECT 'o_orderdate_day' AS "column", CAST(n_rows AS BIGINT) AS n_rows,
               CAST(d_n AS BIGINT) AS n_null, CAST(d_d AS BIGINT) AS n_distinct,
               d_mn AS min_value, d_mx AS max_value FROM one
        UNION ALL
        SELECT 'o_orderkey', CAST(n_rows AS BIGINT), CAST(k_n AS BIGINT),
               CAST(k_d AS BIGINT), k_mn, k_mx FROM one
        UNION ALL
        SELECT 'o_orderstatus', CAST(n_rows AS BIGINT), CAST(s_n AS BIGINT),
               CAST(s_d AS BIGINT), s_mn, s_mx FROM one
        UNION ALL
        SELECT 'o_totalprice_cents', CAST(n_rows AS BIGINT), CAST(p_n AS BIGINT),
               CAST(p_d AS BIGINT), p_mn, p_mx FROM one
        ORDER BY "column"
    """,
    doc="One-pass data-profiling audit (operators/audit.py "
        "profile_table): per column, row/null/EXACT-distinct counts and "
        "min/max rendered through engine-portable domains (ints, "
        "strings, dates, integer cents — never stringified doubles or "
        "fractional timestamps, the two text forms that diverge across "
        "engines; note min/max compare in the STRING domain — '999' > "
        "'1000' — by design, so both engines agree on every cell). One "
        "aggregate computes every statistic together; the per-column "
        "rows come from unpivoting the single 1-row result. Round-13 "
        "stage probe (100x solo): the o_orderkey branch ALONE is 2.45s "
        "of the query's ~3.3s — an EXACT distinct over a fully-unique "
        "15M-row key has no map-side collapse by definition, so all "
        "15M values cross the exchange; grouping in the native long "
        "domain instead of strings measured a WASH (3.3-3.6s both "
        "forms, identical output), so the hash-agg per-value constant, "
        "not key width, is the wall — the q4_top_users/q13 "
        "engine-constant floor. Remaining branches: price_cents 1.44s "
        "(150k distinct), orderdate 0.74s, orderstatus 0.39s, "
        "overlapped by the scheduler inside one job.",
)
def ext_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.audit import profile_table

    orders = _t(spark, sf_dir, "orders")
    return profile_table(
        orders,
        [
            ("o_orderkey", F.col("o_orderkey")),
            ("o_orderstatus", F.col("o_orderstatus")),
            (
                "o_totalprice_cents",
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint"),
            ),
            ("o_orderdate_day", F.col("o_orderdate").cast("date")),
        ],
    )


@register(
    "x_dedup_incremental",
    oracle=r"""
        WITH newb AS (
            SELECT doc_id, text FROM documents
            WHERE doc_id % 5 = 0 AND text IS NOT NULL
        ), idx AS (
            SELECT doc_id, text FROM documents
            WHERE doc_id % 5 <> 0 AND text IS NOT NULL
        ), nfp AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(regexp_replace(lower(text),
                       '\s+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'))) AS fp
            FROM newb
        ), ifp AS (
            SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
                       '\s+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'))) AS fp,
                   MIN(doc_id) AS exact_match
            FROM idx GROUP BY 1
        ), tok_n AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM newb
        ), tok_i AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM idx
        ), sh_n0 AS (
            SELECT doc_id, unnest(list_distinct(
                list_transform(range(1, greatest(len(toks) - 1, 1)),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                AS sh
            FROM tok_n WHERE len(toks) >= 3
        ), sh_i0 AS (
            SELECT doc_id, unnest(list_distinct(
                list_transform(range(1, greatest(len(toks) - 1, 1)),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                AS sh
            FROM tok_i WHERE len(toks) >= 3
        ), heavy AS (
            SELECT sh FROM (
                SELECT sh FROM sh_n0 UNION ALL SELECT sh FROM sh_i0
            ) GROUP BY sh HAVING COUNT(*) > 100
        ), sh_n AS (
            SELECT * FROM sh_n0 s
            WHERE NOT EXISTS (SELECT 1 FROM heavy h WHERE h.sh = s.sh)
        ), sh_i AS (
            SELECT * FROM sh_i0 s
            WHERE NOT EXISTS (SELECT 1 FROM heavy h WHERE h.sh = s.sh)
        ), sz_n AS (
            SELECT doc_id, COUNT(*) AS na FROM sh_n GROUP BY doc_id
        ), sz_i AS (
            SELECT doc_id, COUNT(*) AS nb FROM sh_i GROUP BY doc_id
        ), cand AS (
            SELECT a.doc_id AS nid, b.doc_id AS iid, COUNT(*) AS common
            FROM sh_n a JOIN sh_i b ON a.sh = b.sh GROUP BY 1, 2
        ), near AS (
            SELECT c.nid, MIN(c.iid) AS near_match
            FROM cand c JOIN sz_n ON c.nid = sz_n.doc_id
                        JOIN sz_i ON c.iid = sz_i.doc_id
            WHERE CAST(c.common AS DOUBLE) / (sz_n.na + sz_i.nb - c.common)
                  >= 0.3
            GROUP BY c.nid
        )
        SELECT n.doc_id,
               CASE WHEN i.exact_match IS NOT NULL THEN 'exact_dup'
                    WHEN r.near_match IS NOT NULL THEN 'near_dup'
                    ELSE 'fresh' END AS status,
               COALESCE(i.exact_match, r.near_match) AS match_id
        FROM nfp n
        LEFT JOIN ifp i ON n.fp = i.fp
        LEFT JOIN near r ON n.doc_id = r.nid
        ORDER BY n.doc_id
    """,
    doc="Incremental deduplication (operators/dedup.py "
        "dedup_incremental): a NEW batch (doc_id % 5 = 0 stands in for "
        "the daily arrival) annotated against the EXISTING corpus index "
        "— exact_dup by normalized fingerprint equi join, near_dup by "
        "cross-relation shingle-Jaccard (batch postings x index "
        "fan-out, never corpus x corpus — the shape that keeps daily "
        "ingestion linear in the batch) WITH the max_df=100 stop-shingle "
        "valve engaged (round-7 scale find: the driver corpus is "
        "replication-dense, so every shingle's df multiplies with scale "
        "and the unvalved pair join went 2.9s at sf0.1 -> 297s at 20x; "
        "valved, sizes are recomputed on the pruned postings so the "
        "value is the exact Jaccard of the pruned sets), else fresh; "
        "match_id is the smallest matching index id. Fully re-derived "
        "by the oracle, pruning included. Round-11 scaling note: the "
        "wall is NON-MONOTONIC in scale on this replicated corpus by "
        "construction — measured candidate pairs through the valve: "
        "14.6M at 10x, 2.4M at 20x, 0 at 100x — because replication "
        "multiplies every shingle's df, and at 10x the dense shingles "
        "sit JUST under max_df=100 (worst case: maximal un-pruned "
        "fan-out) while at 20x+ they cross it and prune. Round-12 "
        "stage probes (scripts/bench_incr_ab.py) dismantled the r11 "
        "committed 36.0s/2.1x row: it was 2-task scan starvation "
        "(single-row-group bench layout, fixed by layout v2) stacked "
        "on the regexp failure-path cliff in normalized() (negated "
        "char class ~125 ns/char on clean text; rephrased as "
        "extract-the-keep-runs, 21.5s -> 0.66s) — NOT the posting "
        "machinery. Post-fix at 100x: fingerprint+exact 1.6s, near "
        "stage 4.8s, full 5.6s; prune-restructure A/Bs (broadcast "
        "heavy / one-exchange-per-side) measured a wash, so the "
        "shipped shape stays. A real (non-replicated) corpus keeps df "
        "roughly scale-invariant, so the valve's cut is stable and "
        "the ingest cost is linear in the batch as documented.",
)
def x_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.dedup import dedup_incremental

    docs = _t(spark, sf_dir, "documents")
    new_b = docs.filter(F.col("doc_id") % 5 == 0)
    idx = docs.filter(F.col("doc_id") % 5 != 0)
    return dedup_incremental(
        new_b, idx, threshold=0.3, max_df=100
    ).orderBy("doc_id")


@register(
    "x_dedup_incremental_diff",
    oracle=r"""
        WITH oldv AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 29 != 0
        ), newv AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 13 = 0 THEN text || ' rev2'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 31 != 0
        ), ofp AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(regexp_replace(lower(text),
                       '\s+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'))) AS fp
            FROM oldv
        ), nfp AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(regexp_replace(lower(text),
                       '\s+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'))) AS fp
            FROM newv
        ), diff AS (
            SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.fp IS NOT DISTINCT FROM n.fp THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM ofp o FULL OUTER JOIN nfp n ON o.doc_id = n.doc_id
        ), batch AS (
            SELECT n.doc_id, n.text, d.status AS diff_status
            FROM newv n JOIN diff d ON n.doc_id = d.doc_id
            WHERE d.status IN ('added', 'changed') AND n.text IS NOT NULL
        ), idx AS (
            SELECT doc_id, text FROM oldv WHERE text IS NOT NULL
        ), ifp AS (
            SELECT fp, MIN(doc_id) AS exact_match
            FROM ofp JOIN idx USING (doc_id) GROUP BY fp
        ), bfp AS (
            SELECT b.doc_id,
                   md5(trim(regexp_replace(regexp_replace(lower(b.text),
                       '\s+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'))) AS fp
            FROM batch b
        ), tok_b AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM batch
        ), tok_i AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM idx
        ), sh_b0 AS (
            SELECT doc_id, unnest(list_distinct(
                list_transform(range(1, greatest(len(toks) - 1, 1)),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                AS sh
            FROM tok_b WHERE len(toks) >= 3
        ), sh_i0 AS (
            SELECT doc_id, unnest(list_distinct(
                list_transform(range(1, greatest(len(toks) - 1, 1)),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                AS sh
            FROM tok_i WHERE len(toks) >= 3
        ), heavy AS (
            SELECT sh FROM (
                SELECT sh FROM sh_b0 UNION ALL SELECT sh FROM sh_i0
            ) GROUP BY sh HAVING COUNT(*) > 100
        ), sh_b AS (
            SELECT * FROM sh_b0 s
            WHERE NOT EXISTS (SELECT 1 FROM heavy h WHERE h.sh = s.sh)
        ), sh_i AS (
            SELECT * FROM sh_i0 s
            WHERE NOT EXISTS (SELECT 1 FROM heavy h WHERE h.sh = s.sh)
        ), sz_b AS (
            SELECT doc_id, COUNT(*) AS na FROM sh_b GROUP BY doc_id
        ), sz_i AS (
            SELECT doc_id, COUNT(*) AS nb FROM sh_i GROUP BY doc_id
        ), cand AS (
            SELECT a.doc_id AS nid, b.doc_id AS iid, COUNT(*) AS common
            FROM sh_b a JOIN sh_i b ON a.sh = b.sh GROUP BY 1, 2
        ), near AS (
            SELECT c.nid, MIN(c.iid) AS near_match
            FROM cand c JOIN sz_b ON c.nid = sz_b.doc_id
                        JOIN sz_i ON c.iid = sz_i.doc_id
            WHERE CAST(c.common AS DOUBLE) / (sz_b.na + sz_i.nb - c.common)
                  >= 0.3
            GROUP BY c.nid
        )
        SELECT b.doc_id, b.diff_status,
               CASE WHEN i.exact_match IS NOT NULL THEN 'exact_dup'
                    WHEN r.near_match IS NOT NULL THEN 'near_dup'
                    ELSE 'fresh' END AS dedup_status,
               COALESCE(i.exact_match, r.near_match) AS match_id
        FROM batch b
        JOIN bfp f ON b.doc_id = f.doc_id
        LEFT JOIN ifp i ON f.fp = i.fp
        LEFT JOIN near r ON b.doc_id = r.nid
        ORDER BY b.doc_id
    """,
    doc="The daily-refresh loop a 100 TB pipeline actually runs "
        "(round-11 verdict item 7 — composition of the two proven "
        "primitives): snapshot_diff(old, new) at the realistic-churn "
        "design point (mod-29 adds ~3.4%, mod-13 ' rev2' changes "
        "~7.7%; removed docs need no dedup) gates WHICH documents run "
        "dedup_incremental against the persisted index (the old "
        "snapshot) — so the shingle/fingerprint cost of the batch side "
        "scales with CHURN, never with the corpus, while the index "
        "side stays the one-time build an on-disk posting store would "
        "amortize. Returns (doc_id, diff_status, dedup_status, "
        "match_id) for exactly the added+changed set; match_id may be "
        "the document's own prior version (the old revision is "
        "legitimately in the index). Both halves' semantics are "
        "unchanged from their individually-oracled forms; the oracle "
        "re-derives the full composition (diff CTE -> batch -> "
        "valve-pruned cross-relation Jaccard) independently.",
)
def x_dedup_incremental_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.dedup import dedup_incremental
    from data_wrangling_spark.operators.diff import snapshot_diff

    docs = _t(spark, sf_dir, "documents")
    oldv = docs.filter(F.col("doc_id") % 29 != 0).select("doc_id", "text")
    newv = docs.filter(F.col("doc_id") % 31 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" rev2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    churned = snapshot_diff(oldv, newv, "doc_id", "text").filter(
        F.col("status").isin("added", "changed")
    )
    batch = newv.join(churned, "doc_id").select(
        "doc_id", "text", F.col("status").alias("diff_status")
    )
    out = dedup_incremental(
        batch, oldv, threshold=0.3, max_df=100
    ).withColumnRenamed("status", "dedup_status")
    return out.join(
        batch.select("doc_id", "diff_status"), "doc_id"
    ).select(
        "doc_id", "diff_status", "dedup_status", "match_id"
    ).orderBy("doc_id")


@register(
    "ext_ohlc_bars",
    oracle="""
        SELECT event_type AS key,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bar,
               arg_min(CAST(ROUND(value*100) AS BIGINT),
                       lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '-' ||
                       lpad(CAST(event_id AS VARCHAR), 20, '0')) AS open_cents,
               max(CAST(ROUND(value*100) AS BIGINT)) AS high_cents,
               min(CAST(ROUND(value*100) AS BIGINT)) AS low_cents,
               arg_max(CAST(ROUND(value*100) AS BIGINT),
                       lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '-' ||
                       lpad(CAST(event_id AS VARCHAR), 20, '0')) AS close_cents,
               CAST(COUNT(*) AS BIGINT) AS volume,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
                   AS turnover_cents
        FROM events
        GROUP BY 1, 2
        ORDER BY key, bar
    """,
    doc="Time-bar downsampling (operators/temporal.py ohlc_bars): "
        "hourly OHLC candlesticks per event type — open/close via "
        "min_by/max_by over a fixed-width zero-padded (epoch_micros, "
        "event_id) string order key (lexicographic == numeric, "
        "deterministic under ties and partitioning; DuckDB arg_min "
        "rejects struct keys, so the string domain is the portable "
        "composite order). Integer cents end to end. ONE map-side-"
        "partial hash aggregate, constant-size buffers.",
)
def ext_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_wrangling_spark.operators.temporal import ohlc_bars

    return ohlc_bars(_t(spark, sf_dir, "events"))
