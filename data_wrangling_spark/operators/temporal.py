"""Temporal operators: as-of join and gap-based sessionization.

Extension surface (SURVEY.md §2.7: "Spark provides all join types free;
expose ... as extension operators" — as-of/range joins are the temporal
joins the reference's relational model invites but never needed, and a
training-data pipeline over event logs needs constantly).

Both operators are built on ONE shuffle each (hash partition by the join
key) — the 100 TB-safe shape:

- ``asof_join`` uses the union-marker trick: tag both sides, union, sort
  within each key partition by (time, marker), and carry the most recent
  right-side payload forward with ``last(ignorenulls)`` over a running
  window. Cost: one shuffle of (|L| + |R|) rows on the key — no range
  cross-product, no per-key collect, unlike the naive
  ``L join R on key and r.t <= l.t`` + argmax which explodes to
  |L| × |orders-per-key| intermediate rows.
- ``sessionize`` is lag + conditional cumulative sum over the same
  per-key window — the standard batch form; the streaming twin is
  ``F.session_window`` / ``applyInPandasWithState`` (see
  streaming/events.py).

Skew note: both partition by the entity key; the window is linear in
the key's row count but runs as ONE task per key — the one skew shape
AQE cannot split. ``asof_join_adaptive`` is the scale-safe default: it
detects heavy keys exactly (one cheap counting job) and routes only
those through ``asof_join_bucketed``'s (key, time-bucket) window,
leaving the uniform mass on the plain single-shuffle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _seconds(df: DataFrame, colname: str) -> F.Column:
    """Epoch seconds as double for any time-like column. TIMESTAMP_NTZ /
    DATE have no direct double cast; route through the session-zone
    timestamp (monotone, so ordering/bucketing stays consistent across
    columns converted the same way)."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    c = F.col(colname)
    if isinstance(df.schema[colname].dataType, (TimestampType, TimestampNTZType, DateType)):
        c = c.cast("timestamp_ltz")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: dict[str, str],
    direction: str = "backward",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the most recent right row
    with the same ``on`` key and right_time <= left_time (direction
    'backward'). Left rows with no prior right row keep nulls —
    i.e. LEFT ASOF JOIN semantics (DuckDB: ``ASOF LEFT JOIN``).

    ``payload`` maps right-side column -> output alias. The payload is
    carried as ONE struct through a single ``last(ignorenulls)`` — a
    struct with NULL fields is itself non-NULL, so the carry picks one
    right ROW atomically: a NULL payload field in the winning right row
    stays NULL in the output instead of being silently backfilled from
    an older right row (per-column carries stitch fields from different
    rows — the round-3 advice defect). One window expression also
    evaluates cheaper than N.

    Ties on right_time: either pre-deduplicate the right side, or pass
    ``right_tiebreak`` — a right-side column; among right rows with equal
    (key, time) the GREATEST tiebreak value wins. This folds the
    deduplication into the carry window's existing sort (the winning row
    sorts last, and ``last(ignorenulls)`` naturally carries it), which is
    one whole shuffle + two hash aggregates cheaper than a groupBy
    pre-dedup — the same rows flow through the one hash exchange this
    operator already needs. For smallest-wins semantics, negate into a
    helper column and pass that. Row-atomic carry makes this equivalence
    exact even with NULL payload fields.

    direction 'forward' attaches the EARLIEST right row at-or-after
    left_time instead (DuckDB: ``ASOF LEFT JOIN ... ON l.t <= r.t``) —
    same single-shuffle shape, with the carry window running backward.
    (``right_tiebreak`` still means greatest-wins: the traversal is
    reversed in time only; equal-time right rows keep ascending tiebreak
    order before their left rows.)
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = [c for c in left.columns]
    # right rows sort BEFORE left rows at equal timestamps (marker 0 < 1)
    # so right_time == left_time counts in both directions' "at-or-"
    # semantics. Forward REVERSES the time sort instead of the frame:
    # descending traversal + the same running last(ignorenulls) over
    # [unboundedPreceding, currentRow] carries the smallest rt >= t in
    # O(n) per key — a [currentRow, unboundedFollowing] frame would be
    # the O(n^2) shrinking-frame evaluator at scale.
    tb_type = right.schema[right_tiebreak].dataType if right_tiebreak else None
    # shuffle-width economy: left columns ride as plain nullable columns
    # (they are only read back on left rows, so no atomicity concern —
    # unlike the right payload, which MUST be one struct, see above);
    # the key/time columns are not stored twice when _k/_t can exactly
    # reconstruct them (identical types on both sides — a union type
    # promotion would otherwise change the output schema)
    reconstructable = {
        c
        for c, tagged in ((on, "_k"), (left_time, "_t"))
        if left.schema[c].dataType
        == right.schema[on if tagged == "_k" else right_time].dataType
    }
    carry_cols = [c for c in lcols if c not in reconstructable]
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_m"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_lc_{c}")
            for c in carry_cols
        ],
        F.struct(
            *[F.col(src).alias(dst) for src, dst in payload.items()]
        ).alias("_p"),
        *([F.col(right_tiebreak).alias("_tb")] if right_tiebreak else []),
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_m"),
        *[F.col(c).alias(f"_lc_{c}") for c in carry_cols],
        F.lit(None).cast(r_tagged.schema["_p"].dataType).alias("_p"),
        *([F.lit(None).cast(tb_type).alias("_tb")] if right_tiebreak else []),
    )
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    # _m splits right(0) before left(1) at equal time; _tb orders equal-
    # time right rows ascending so the greatest sorts last and wins the
    # last(ignorenulls) carry (left rows' _tb is NULL — asc-nulls-first
    # keeps them after every right row only via _m, which precedes _tb)
    order_cols = [t_order, F.col("_m")] + (
        [F.col("_tb").asc_nulls_first()] if right_tiebreak else []
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_m",
        "_k",
        "_t",
        *[f"_lc_{c}" for c in carry_cols],
        F.last("_p", ignorenulls=True).over(w).alias("_c"),
    )
    return carried.filter(F.col("_m") == 1).select(
        *[
            F.col(
                "_k"
                if c == on and c in reconstructable
                else "_t"
                if c == left_time and c in reconstructable
                else f"_lc_{c}"
            ).alias(c)
            for c in lcols
        ],
        *[F.col(f"_c.{dst}").alias(dst) for dst in payload.values()],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: dict[str, str],
    bucket_seconds: int,
    direction: str = "backward",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """``asof_join`` with the per-key window split into fixed-width time
    buckets — the skew-safe form for hot keys.

    The plain operator partitions the carry window by the join key: a
    key holding 1% of a 100 TB event stream puts 1 TB of rows through
    ONE task, and AQE cannot split a window partition the way it splits
    a skewed join partition. Here the shuffle/window key is
    (key, floor(time / bucket_seconds)), so a hot key's rows spread
    across its time buckets; what crosses bucket boundaries is one
    pre-aggregated payload row per (key, bucket) — never the raw data.

    Results are EXACTLY ``asof_join``'s (pinned by equivalence tests):
    within a bucket the same union-marker carry runs; rows whose bucket
    holds no earlier right row take the boundary payload — the latest
    (direction-wise) right payload over all strictly-earlier buckets.
    ``direction='forward'`` reuses the backward machinery on negated
    time (max -t with -rt <= -lt IS min rt with rt >= lt; the
    greatest-tiebreak rule is direction-invariant).

    Cost vs ``asof_join``: ~nothing — the round-5 form paid three extra
    input-sized passes (right summary groupBy, left distinct buckets,
    a three-way union through the big shuffle) and measured 2.3-2.9x
    the plain form on uniform keys; this form derives EVERYTHING from
    the ONE big exchange on (key, bucket):

    - the union of both (tagged) inputs is explicitly repartitioned on
      (_ks, _bk) — that exchange is the only input-sized shuffle, and
      Spark's exchange/stage reuse computes it ONCE for both consumers;
    - the carry window sorts/reads it (exactly the plain op's cost on a
      finer key);
    - the per-bucket summary is a hash aggregate over the SAME exchange
      (already clustered on the grouping keys: no second shuffle, no
      second scan), and the boundary window over the summaries is
      O(touched buckets);
    - boundary payloads join back to the window OUTPUT on (_ks, _bk):
      the big side is already hash-partitioned AND sorted on a prefix
      of the join keys, so only the O(buckets) side moves (AQE
      broadcasts it at bench scale). A left row's in-bucket carry wins
      via ``coalesce``; only carry-less rows read the boundary.

    The key rides as ``_ks = struct(key)``: struct equality and struct
    hashing are NULL-SAFE per field (``struct(NULL) = struct(NULL)`` is
    TRUE), so NULL keys form one partition — matching plain
    ``asof_join``'s window semantics, where NULL is a real key — and
    the boundary join stays a plain equality that preserves
    co-partitioning (an ``eqNullSafe`` join key would be rewritten to
    (coalesce, isnull) keys and force the big side to re-shuffle; a
    plain-column join would silently drop NULL-key boundaries, the
    round-6 review find).

    Equal (key, time, tiebreak) right rows with different payloads are
    nondeterministic in BOTH operators — make the tiebreak unique.
    Pick ``bucket_seconds`` so a hot key's densest bucket fits a task
    comfortably (e.g. daily buckets for a key doing ~1M rows/day)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")

    sign = 1.0 if direction == "backward" else -1.0
    lcols = list(left.columns)
    carry_cols = [c for c in lcols if c != on]  # on reconstructs from _ks
    w_lit = float(bucket_seconds)

    l_s = (_seconds(left, left_time) * sign).alias("_s")
    r_s = (_seconds(right, right_time) * sign).alias("_s")
    tb_type = right.schema[right_tiebreak].dataType if right_tiebreak else None

    # NULL times get a sentinel bucket at the START of the traversal —
    # which is bucket -2^63 going backward but +2^63-1 going forward,
    # because plain asof_join orders by _t asc (nulls FIRST) backward
    # and _t desc (nulls LAST) forward: backward, a null-time right row
    # is 'earliest' and carries into every later row until superseded;
    # forward, null-time rows trail the whole traversal and only see
    # each other plus the final boundary. The sentinel reproduces both
    # orderings exactly (pinned by the null-time equivalence test; the
    # round-5 review caught the forward case diverging when NULLs
    # grouped into SQL's one NULL bucket, which sorts first both ways).
    null_bucket = -(2**63) if direction == "backward" else 2**63 - 1
    bucket_of = lambda s: F.coalesce(  # noqa: E731
        F.floor(s / w_lit).cast("long"), F.lit(null_bucket).cast("long")
    )
    r_rows = right.select(
        F.struct(F.col(on)).alias("_ks"),
        r_s,
        F.lit(0).alias("_m"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_lc_{c}")
            for c in carry_cols
        ],
        F.struct(
            *[F.col(src).alias(dst) for src, dst in payload.items()]
        ).alias("_p"),
        *([F.col(right_tiebreak).alias("_tb")] if right_tiebreak else []),
    ).withColumn("_bk", bucket_of(F.col("_s")))
    l_rows = left.select(
        F.struct(F.col(on)).alias("_ks"),
        l_s,
        F.lit(1).alias("_m"),
        *[F.col(c).alias(f"_lc_{c}") for c in carry_cols],
        F.lit(None).cast(r_rows.schema["_p"].dataType).alias("_p"),
        *([F.lit(None).cast(tb_type).alias("_tb")] if right_tiebreak else []),
    ).withColumn("_bk", bucket_of(F.col("_s")))
    # THE one input-sized exchange, shared by the window and the summary
    tagged = l_rows.unionByName(r_rows).repartition("_ks", "_bk")

    # per-(key,bucket) winning right payload: any right row outranks
    # every left row (left rows exist in the agg only so LEFT-ONLY
    # buckets still get a summary row — _pb NULL there — which is what
    # lets the boundary window cover them without a separate distinct
    # pass); among right rows, greatest (time, tiebreak) wins, matching
    # the carry window's (_s asc, _m, _tb asc) + last() order exactly.
    ord_fields = [(F.lit(1) - F.col("_m")).alias("r"), F.col("_s").alias("s")]
    if right_tiebreak:
        ord_fields.append(F.col("_tb").alias("t"))
    summary = tagged.groupBy("_ks", "_bk").agg(
        F.max_by("_p", F.struct(*ord_fields)).alias("_pb")
    )
    carry_w = (
        Window.partitionBy("_ks")
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = summary.select(
        "_ks",
        "_bk",
        F.last("_pb", ignorenulls=True).over(carry_w).alias("_pc"),
    ).filter(F.col("_pc").isNotNull())

    order_cols = [F.col("_s").asc_nulls_first(), F.col("_m")] + (
        [F.col("_tb").asc_nulls_first()] if right_tiebreak else []
    )
    w = (
        Window.partitionBy("_ks", "_bk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        tagged.select(
            "_ks",
            "_bk",
            "_m",
            *[f"_lc_{c}" for c in carry_cols],
            F.last("_p", ignorenulls=True).over(w).alias("_c"),
        )
        .filter(F.col("_m") == 1)
    )
    best = F.coalesce(F.col("_c"), F.col("_pc"))
    return carried.join(boundary, ["_ks", "_bk"], "left").select(
        *[
            (
                F.col("_ks").getField(on)
                if c == on
                else F.col(f"_lc_{c}")
            ).alias(c)
            for c in lcols
        ],
        *[best.getField(dst).alias(dst) for dst in payload.values()],
    )


def asof_join_adaptive(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: dict[str, str],
    bucket_seconds: int,
    direction: str = "backward",
    right_tiebreak: str | None = None,
    heavy_threshold: int = 1_000_000,
) -> DataFrame:
    """The scale-safe DEFAULT as-of join: plain ``asof_join`` for the
    uniform mass of keys, ``asof_join_bucketed`` for detected hot keys
    only — so the bucketed form's cross-bucket machinery (its ~2-3x
    constant on uniform data, measured in SCALING.md) is paid ONLY by
    the keys that need it, and the plain form's skew cliff (one window
    task per key, the one shape AQE cannot split) is capped at
    ``heavy_threshold`` rows per task.

    Detection is EXACT, not sketched, and fully LAZY — part of the
    returned plan, so composition and honest benchmarking both work:
    per-key counts over the union of both sides' key columns (map-side
    partial aggregation makes the shuffle O(distinct keys); the scan
    reads one column, so parquet column pruning keeps it a few percent
    of the join's own cost), filtered to count > heavy_threshold — a
    set provably bounded by total_rows / heavy_threshold (~100k keys
    at 10^11 rows with the 1M default: a sub-MB broadcast). Both
    inputs split against a BROADCAST of that heavy-key set (null-safe
    equality, so a heavy NULL key routes with its partition — NULL is
    a real key to the window semantics); heavy rows run the bucketed
    form, the rest the plain form, results union.

    The adaptivity itself is delegated to AQE, not driver code: with
    no heavy keys the broadcast is EMPTY at runtime, and AQE's empty-
    relation propagation rewrites the anti joins into plain
    passthroughs and collapses the entire semi-join + bucketed branch
    to nothing — the executed plan degenerates to plain ``asof_join``
    plus the one counting aggregate (pinned by the adaptive plan
    test). No collect, no second code path, no eager action.

    Key-partitioned semantics make the split exact: every (left row,
    matching right rows) group lives entirely on one side of the split,
    so plain ∪ bucketed = plain on everything (pinned by equivalence
    tests, including NULL keys and both directions).

    ``heavy_threshold`` is the max rows a single carry-window task
    should absorb: the 1M default sorts ~tens of MB per task. Size it
    DOWN for wide rows and benchmark rigs (SCALING.md's GB-scale skew
    section uses 50k, mirroring how its AQE skew thresholds shrink the
    256 MB default)."""
    if heavy_threshold <= 0:
        raise ValueError("heavy_threshold must be positive")

    heavy_keys = (
        left.select(F.col(on).alias("__heavy_k"))
        .unionByName(right.select(F.col(on).alias("__heavy_k")))
        .groupBy("__heavy_k")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > F.lit(heavy_threshold))
        .select("__heavy_k")
    )

    def _split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
        cond = df[on].eqNullSafe(heavy_keys["__heavy_k"])
        return (
            df.join(F.broadcast(heavy_keys), cond, "left_semi"),
            df.join(F.broadcast(heavy_keys), cond, "left_anti"),
        )

    l_heavy, l_light = _split(left)
    r_heavy, r_light = _split(right)
    plain = asof_join(
        l_light, r_light, on, left_time, right_time, payload,
        direction, right_tiebreak,
    )
    bucketed = asof_join_bucketed(
        l_heavy, r_heavy, on, left_time, right_time, payload,
        bucket_seconds, direction, right_tiebreak,
    )
    return plain.unionByName(bucketed)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start: str,
    end: str,
    on: str | None = None,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Inner join of point rows to every interval row containing them:
    ``start <= point_time < end`` (half-open, the event-time convention),
    optionally also equi on ``on`` (same column name on both sides).
    Output carries all point columns plus all interval columns (minus the
    shared key and internal bucket column); other column names must be
    disjoint.

    Two scale shapes, chosen by the arguments:

    - with ``on``: an equi join on the key with the range predicate as a
      post-join filter — one shuffle on the key; Catalyst extracts the
      equality conjunct as the join key and AQE picks broadcast vs
      sort-merge. Right when per-key interval fan-out is bounded.
    - ``bucket_seconds`` (required when ``on`` is None): both sides are
      mapped to fixed-width time buckets — each interval explodes to the
      ``len/W + 1`` buckets it overlaps (``sequence``), each point to
      exactly one — and the join key becomes (key?, bucket). This turns
      what Spark would otherwise plan as a broadcast-nested-loop range
      join into a plain equi shuffle join whose row blowup is bounded by
      interval_length/W; pick W near the typical interval length. The
      exact range predicate still filters after the bucket match, so
      bucketing only affects cost, never results.

    Without either, the plan would be a cartesian range join — refused.
    """
    if on is None and bucket_seconds is None:
        raise ValueError("interval_join needs an equi key, a bucket width, or both")
    overlap = (set(points.columns) & set(intervals.columns)) - {on}
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap)}")
    if bucket_seconds is not None and "_bucket" in set(points.columns) | set(intervals.columns):
        raise ValueError("'_bucket' is reserved by interval_join's bucketed mode")

    p, i = points, intervals
    if bucket_seconds is not None:
        w = float(bucket_seconds)
        p = p.withColumn(
            "_bucket", F.floor(_seconds(p, point_time) / w).cast("long")
        )
        # inclusive bucket range [floor(start/W), floor(end/W)]: the end
        # bucket may be one wider than the half-open interval needs, but
        # the exact predicate below removes those rows
        i = i.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(_seconds(i, start) / w).cast("long"),
                    F.floor(_seconds(i, end) / w).cast("long"),
                )
            ),
        )
    pa, ia = p.alias("_p"), i.alias("_i")
    cond = (F.col(f"_p.{point_time}") >= F.col(f"_i.{start}")) & (
        F.col(f"_p.{point_time}") < F.col(f"_i.{end}")
    )
    if bucket_seconds is not None:
        cond = (F.col("_p._bucket") == F.col("_i._bucket")) & cond
    if on is not None:
        cond = (F.col(f"_p.{on}") == F.col(f"_i.{on}")) & cond
    out_point = [c for c in points.columns]
    out_interval = [c for c in intervals.columns if c != on]
    return pa.join(ia, cond).select(
        *[F.col(f"_p.{c}").alias(c) for c in out_point],
        *[F.col(f"_i.{c}").alias(c) for c in out_interval],
    )


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    gap_minutes: int = 30,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event exceeds ``gap_minutes``. Returns one row per
    session: (key, session_no, n_events, session_start, session_end),
    session_no 1-based per key in time order.

    ``order_tiebreak``: extra column ordering events with equal
    timestamps (required for determinism on real logs).
    """
    order = [ts] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    secs = _seconds(events, ts)
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    run = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_session = events.withColumn("_new", new_session).withColumn(
        "session_no", F.sum("_new").over(run)
    )
    return (
        with_session.groupBy(key, "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
        )
    )
