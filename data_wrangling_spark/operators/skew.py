"""Skew-mitigation aggregation patterns (SURVEY.md §4 "Physical profile
at 100 TB"; task-spec scale checklist: "skewed keys → salting").

Spark's partial (map-side) aggregation already neutralizes skew for
algebraic aggregates (count/sum/min/max) — each mapper pre-collapses its
rows, so a hot key ships one partial per partition, not its raw rows.
Salting matters for the HOLISTIC aggregates whose per-key state is large:
``countDistinct``, ``collect_set``, percentile sketches. There a hot key
concentrates every distinct value on one reducer.

``salted_distinct_count`` shows the exact-decomposition form: salt by a
HASH OF THE DISTINCT COLUMN, not random — hash-partitioning the distinct
values into disjoint buckets makes per-bucket distinct counts additive,
so the two-stage result is exactly equal to the one-stage one (pinned by
the DuckDB oracle on ext_skew_salted_distinct), while the hot key's state
is spread across ``buckets`` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt_col: str | None = None,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: the big/skewed ``left`` gets a deterministic
    salt in [0, buckets) from ``salt_col`` (any NON-NULL, well-distributed
    left column, e.g. the row id); ``right`` is replicated once per salt
    value; the join key becomes (on..., salt) so a hot key's rows spread
    across ``buckets`` reducers instead of one.

    ``salt_col`` caveat: ``xxhash64`` maps every NULL to the same value,
    and a low-cardinality column yields at most that many buckets — in
    either case the hot key's rows co-bucket and the salting silently
    does nothing (results stay correct; only the spread is lost). When no
    single column is known-good, omit ``salt_col``: the default salts by
    a whole-row hash over every left column, which spreads any key whose
    rows differ in at least one column (only fully-identical duplicate
    rows still co-bucket).

    Results are exactly the plain join's (salt values partition the
    left side; each left row still meets every matching right row,
    exactly once — pinned in tests/test_skew.py).

    When to use: AQE's skew-join handling (OptimizeSkewedJoin) already
    splits oversized sort-merge partitions at runtime and is the first
    choice. Explicit salting remains for the cases AQE can't rewrite —
    skewed keys feeding a single-key aggregation downstream, stream-
    static joins (no AQE in micro-batch plans until 4.x), or when the
    replicated side is modest but above the broadcast threshold. Cost:
    ``buckets``× replication shuffle of ``right`` — keep it small.

    Only left-preserving join types are allowed: under right/full outer
    joins the replicated right rows with no left match would each
    survive once PER SALT (buckets× duplicated null-padded output)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only: '{how}' would "
            "duplicate unmatched replicated right rows once per salt"
        )
    if "_salt" in set(left.columns) | set(right.columns):
        raise ValueError("'_salt' is reserved by salted_join")
    keys = [on] if isinstance(on, str) else list(on)
    salt_src = (
        [F.col(salt_col)]
        if salt_col is not None
        else [F.col(c) for c in left.columns]
    )
    l = left.withColumn("_salt", F.pmod(F.xxhash64(*salt_src), F.lit(buckets)))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return l.join(r, keys + ["_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    key: str | Column,
    distinct_col: str,
    buckets: int = 32,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) GROUP BY key, skew-safe.

    Stage 1 groups by (key, hash(distinct_col) % buckets) — the hot key's
    distinct-value state is split across ``buckets`` reducers; stage 2
    sums the disjoint bucket counts. Both stages are ordinary hash
    aggregations with map-side partials.
    """
    k = F.col(key) if isinstance(key, str) else key
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets))
    return (
        df.groupBy(k.alias("_key"), salt.alias("_bucket"))
        .agg(F.countDistinct(distinct_col).alias("_partial"))
        .groupBy(F.col("_key").alias(key if isinstance(key, str) else "key"))
        .agg(F.sum("_partial").cast("bigint").alias(out_col))
    )
