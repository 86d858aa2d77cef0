"""Count-min sketch over DataFrames — mergeable frequency estimation
and heavy-hitter detection for unbounded key domains.

SURVEY.md §2.11 sketch family (alongside the HLL rollup in
plans/scale_queries.py). The sketch is a (depth × width) counter grid:
row i counts keys by hash h_i; the frequency estimate is the MIN over
rows, which only ever OVER-estimates (collisions add, never subtract).

Scale posture: building the sketch is one narrow explode (depth rows
per input row, depth is 4) plus one hash aggregation whose output is
at most depth×width rows — map-side partial aggregation does almost
all the work, and two sketches merge by summing matching cells, so
per-partition / per-day sketches roll up without a second pass over
raw data (same mergeability argument as the HLL rollup). The estimate
join broadcasts the tiny sketch.

The hash is multiplicative-mod over BIGINT arithmetic — expressible
identically in ANSI SQL, so sketch contents (not just error bounds)
are oracle-checkable across engines. Keys must be non-negative
integers; % on negatives differs across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: modulus (prime ~1e9: keeps (k%P)*a + b within int64) and per-row
#: hash coefficients — deterministic, engine-portable
_P = 1_000_000_007
_A0, _A_STEP = 1_000_003, 97
_B0, _B_STEP = 774_583, 131


def _bucket(key: Column, row: int, width: int) -> Column:
    a = _A0 + _A_STEP * row
    b = _B0 + _B_STEP * row
    # cast to long FIRST: an int32 key would overflow 32-bit arithmetic
    # at (key % P) * a (ANSI mode raises, non-ANSI silently wraps to
    # buckets that no longer match bucket_sql's oracle)
    return ((key.cast("long") % _P) * F.lit(a) + F.lit(b)) % _P % width


def _cells(key: Column, depth: int, width: int) -> Column:
    """The (row, bucket) cell array for a key — ONE definition shared by
    sketch build and probe, so the layouts cannot drift."""
    return F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            _bucket(key, i, width).alias("bucket"),
        )
        for i in range(depth)
    ])


def bucket_sql(key_expr: str, row_expr: str, width: int) -> str:
    """The same hash as ANSI SQL text, for oracle queries."""
    return (
        f"((({key_expr} % {_P}) * ({_A0} + {_A_STEP}*{row_expr}) "
        f"+ ({_B0} + {_B_STEP}*{row_expr})) % {_P}) % {width}"
    )


def bloom_positions(key: Column, k: int = 7, m: int = 1 << 20) -> Column:
    """The k bit positions for a key in an m-bit Bloom filter: k
    independent xxhash64 draws (seeded by index) mod m."""
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(k)]
    )


def bloom_build(df: DataFrame, key_col: str, k: int = 7, m: int = 1 << 20) -> DataFrame:
    """Build a Bloom filter as a DENSE BITSET: a ONE-row DataFrame whose
    ``words`` column is an array of m/64 longs. Spark's own runtime
    bloom (`bloom_filter_agg`) is not in the public function registry;
    this form broadcasts as a single array (m=2^20 -> 128 KB) and
    probes with O(1) ``element_at`` — no join, no shuffle of the probe
    side. Two filters over the same (k, m) merge by element-wise OR
    (``zip_with``), equal to a single build over the unioned keys.

    Membership is ONE-SIDED like any Bloom filter: every inserted key
    probes positive (no false negatives); non-members probe positive
    with ~(1 - e^{-k*n/m})^k probability. Size m for the expected key
    count (k=7, m/n=16 gives ~0.5% FP). Build cost: the key set
    explodes to k positions and aggregates to <=m/64 word rows — tiny
    compared to any real reference set."""
    if m % 64 != 0:
        raise ValueError("m must be a multiple of 64")
    n_words = m // 64
    word_bits = (
        df.select(F.explode(bloom_positions(F.col(key_col), k, m)).alias("pos"))
        .distinct()
        # shiftleft's amount must be a literal in the Python API; the
        # SQL form takes a column
        .selectExpr(
            "CAST(pos / 64 AS LONG) AS w",
            "shiftleft(1L, CAST(pos % 64 AS INT)) AS bit",
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    dense = (
        F.broadcast(
            # dense index 0..n_words-1 so absent words become 0, and the
            # collect_list below is position-aligned
            df.sparkSession.range(n_words).select(F.col("id").alias("w"))
        )
        .join(word_bits, "w", "left")
        .select("w", F.coalesce("word", F.lit(0)).alias("word"))
    )
    # sort_array over (w, word) structs: collect_list order is NOT
    # guaranteed through an aggregation, the struct sort is
    return dense.agg(
        F.sort_array(F.collect_list(F.struct("w", "word"))).alias("s")
    ).select(F.col("s.word").alias("words"))


def bloom_might_contain(
    probes: DataFrame,
    bloom: DataFrame,
    key_col: str,
    k: int = 7,
    m: int = 1 << 20,
    out_col: str = "might_contain",
) -> DataFrame:
    """Probe the Bloom filter: a key tests positive iff ALL k of its bit
    positions are set. The one-row bitset cross-joins in (broadcast, no
    shuffle) and each row evaluates k O(1) ``element_at`` word lookups
    — one scan of ``probes``, row-local, so duplicate and NULL probe
    keys behave exactly like unique ones. Adds boolean ``out_col``."""
    reserved = {"_bloom_words", "_bloom_pos", out_col} & set(probes.columns)
    if reserved:
        raise ValueError(f"columns reserved by bloom_might_contain: {sorted(reserved)}")
    bits = bloom.select(F.col("words").alias("_bloom_words"))
    return (
        probes.crossJoin(F.broadcast(bits))
        .withColumn("_bloom_pos", bloom_positions(F.col(key_col), k, m))
        # SQL forall: the Python shiftleft only takes a literal amount
        .withColumn(
            out_col,
            F.expr(
                "forall(_bloom_pos, p -> "
                "(element_at(_bloom_words, CAST(p / 64 AS INT) + 1) "
                " & shiftleft(1L, CAST(p % 64 AS INT))) != 0)"
            ),
        )
        .drop("_bloom_words", "_bloom_pos")
    )


def countmin_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt), at most depth×width rows.
    Merge two sketches by unioning and summing cnt per (row, bucket)."""
    key = F.col(key_col)
    return (
        df.select(F.explode(_cells(key, depth, width)).alias("cell"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Estimated frequency for each key in ``keys``: min over the
    key's depth cells, where an ABSENT sketch cell counts as 0 (a key
    the stream never touched estimates 0, not a collision's count) —
    hence the left join + coalesce. The sketch (≤ depth×width rows) is
    broadcast, so this is one scan of ``keys`` with no shuffle on the
    big side."""
    key = F.col(key_col)
    probes = keys.select(
        key_col, F.explode(_cells(key, depth, width)).alias("cell")
    ).select(key_col, "cell.row", "cell.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog — engine-portable register tables
# ---------------------------------------------------------------------------
# Spark ships hll_sketch_agg (Apache DataSketches), but its binary sketch
# is engine-internal: no SQL oracle can re-derive the estimate, so the
# rollup query spent rounds 5-6 behind a pinned-snapshot golden. This
# implementation keeps the SAME distributed posture (tiny mergeable
# per-group sketches, union without revisiting raw data) while making
# every step exact integer/portable arithmetic, so DuckDB replays the
# registers AND the estimate independently:
#
# - hash: a 32-bit avalanche (xor-shift + two odd-constant multiplies,
#   every product < 2^61 so ANSI-safe) built only from *, %, xor, >>
#   — identical text in both engines. Two decorrelated draws: h1 picks
#   the bucket (low p bits), h2 supplies the rank source.
# - register: M_j = max over keys of rho(h2), rho = leading zeros of
#   the 32-bit field + 1 (= 33 - length(bin(h2)), 33 for h2 = 0) — an
#   integer derived via the bin() string both engines share.
# - estimate: T = sum over all m buckets of 2^(33 - M_j) (absent bucket
#   => M_j = 0 => 2^33) is an EXACT BIGINT (<= m * 2^33 = 2^45 at
#   p = 12); E_raw = C / double(T) with C = alpha_m * m^2 * 2^33
#   embedded as ONE double literal in both engines; linear counting
#   m * ln(m / V) below 2.5m with V empty buckets (ln portability is
#   the lm_score/entropy precedent — identical on both engines for
#   identical double inputs).
#
# Keys must be non-negative integers (same precondition as the
# count-min family: % and >> on negatives differ across engines).
# Rank source is 32 bits, so registers saturate near m * 2^32 distinct
# (~10^13 at p = 12) — size p up for bigger domains.

_HLL_C1 = 0x45D9F3B       # first avalanche multiplier (< 2^27)
_HLL_C2 = 0x119DE1F3      # second avalanche multiplier (< 2^29)
_HLL_SEED2 = 0x9E3779B9   # xor seed decorrelating the rank hash
_M32 = 1 << 32


def _hll_avalanche(x: Column) -> Column:
    x = (x.bitwiseXOR(F.shiftright(x, 16)) * F.lit(_HLL_C1)) % F.lit(_M32)
    x = (x.bitwiseXOR(F.shiftright(x, 16)) * F.lit(_HLL_C2)) % F.lit(_M32)
    return x.bitwiseXOR(F.shiftright(x, 16))


def _hll_avalanche_sql(x: str) -> str:
    a = f"(xor({x} >> 16, {x}) * {_HLL_C1}) % {_M32}"
    b = f"(xor(({a}) >> 16, {a}) * {_HLL_C2}) % {_M32}"
    return f"xor(({b}) >> 16, {b})"


def hll_bucket(key: Column, p: int = 12) -> Column:
    """Bucket index in [0, 2^p): low p bits of the first hash draw."""
    x = _hll_fold32(key)
    return _hll_avalanche(x) % F.lit(1 << p)


def hll_rho(key: Column) -> Column:
    """Rank: leading zeros of the 32-bit second draw, plus one."""
    h2 = _hll_avalanche(_hll_fold32(key).bitwiseXOR(F.lit(_HLL_SEED2)))
    return F.when(h2 == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(h2))
    )


def _hll_fold32(key: Column) -> Column:
    k = key.cast("long")
    return F.shiftright(k, 32).bitwiseXOR(k.bitwiseAND(F.lit(_M32 - 1)))


def hll_sql(key_expr: str, p: int = 12) -> tuple[str, str]:
    """(bucket_sql, rho_sql) — the same hash as ANSI SQL text for
    oracle queries (DuckDB xor()/>>/%/bin are bit-identical here)."""
    x = f"xor(({key_expr}) >> 32, ({key_expr}) & {_M32 - 1})"
    h1 = _hll_avalanche_sql(x)
    h2 = _hll_avalanche_sql(f"xor({x}, {_HLL_SEED2})")
    bucket = f"({h1}) % {1 << p}"
    rho = (
        f"CASE WHEN ({h2}) = 0 THEN 33 "
        f"ELSE 33 - length(bin({h2})) END"
    )
    return bucket, rho


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = 12
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., bucket, rho_max),
    <= 2^p rows per group. ONE hash aggregate with constant-size
    max buffers; NULL keys are excluded (COUNT DISTINCT semantics).
    Register tables for the same p MERGE by max — ``hll_registers`` of
    a union == ``hll_merge`` of per-part tables, no raw-data revisit.

    The table carries its precision as a ``_hll_p`` column (constant
    literal, free after parquet RLE): building at one p and merging or
    estimating at another silently mis-computes V = m - |buckets|, so
    ``hll_merge``/``hll_estimate`` fail fast on a mismatch instead
    (advisor find, round 7)."""
    key = F.col(key_col)
    return (
        df.filter(key.isNotNull())
        .groupBy(*group_cols, hll_bucket(key, p).alias("bucket"))
        .agg(F.max(hll_rho(key)).alias("rho_max"))
        .withColumn("_hll_p", F.lit(p))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union register tables built at the same p: max per (group,
    bucket). Exact and order-free (max is associative/commutative), so
    per-day/per-partition/per-cluster sketches roll up to any coarser
    grouping without a second pass over raw data.

    Merging parts built at DIFFERENT p would silently corrupt the
    estimate; when the inputs carry ``_hll_p`` the merged plan raises
    at execution on any disagreement. The disagreement check is per
    GROUP, not per (group, bucket): parts built at different p have
    DISJOINT bucket domains, so a per-bucket min/max never sees both
    values and the corruption would slip through to hll_estimate
    (advisor find, round 8). The group-level min/max runs as a window
    over the merged register table — O(groups * 2^p) rows by
    construction (control-plane-sized: registers, never raw data), so
    even the empty-``group_cols`` global window sees at most 2^p
    rows."""
    if "_hll_p" in registers.columns:
        merged = registers.groupBy(*group_cols, "bucket").agg(
            F.max("rho_max").alias("rho_max"),
            F.min("_hll_p").alias("_p_lo"),
            F.max("_hll_p").alias("_p_hi"),
        )
        wg = Window.partitionBy(*group_cols) if group_cols else (
            Window.partitionBy()
        )
        g_lo = F.min("_p_lo").over(wg)
        g_hi = F.max("_p_hi").over(wg)
        guard = F.when(
            g_lo != g_hi,
            F.raise_error(
                F.concat(
                    F.lit("hll_merge: register tables built at different "
                          "precisions p="),
                    g_lo, F.lit(" vs p="), g_hi,
                )
            ).cast("int"),
        ).otherwise(F.col("_p_hi"))
        return merged.select(
            *group_cols, "bucket", "rho_max", guard.alias("_hll_p")
        )
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("rho_max").alias("rho_max")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    p: int = 12,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Distinct-count estimate per group from a register table. All
    inputs to the two float steps (one division, optional ln) are exact
    integers, so the estimate is engine-portable (see module notes).

    Fails fast (plan-level ``raise_error``, one comparison per register
    row) when the table was built at a different precision than ``p``:
    via the carried ``_hll_p`` column when present, else by the
    necessary condition bucket < 2^p (catches built-at-larger-p;
    advisor find, round 7)."""
    m = 1 << p
    if "_hll_p" in registers.columns:
        chk = F.when(
            F.col("_hll_p") != F.lit(p),
            F.raise_error(
                F.concat(
                    F.lit("hll_estimate: registers built at p="),
                    F.col("_hll_p"),
                    F.lit(f", estimating at p={p}"),
                )
            ).cast("int"),
        ).otherwise(F.col("rho_max"))
    else:
        chk = F.when(
            F.col("bucket") >= F.lit(m),
            F.raise_error(
                F.lit(
                    f"hll_estimate: bucket >= 2^{p} — registers were "
                    "built at a larger precision than the estimate p"
                )
            ).cast("int"),
        ).otherwise(F.col("rho_max"))
    registers = registers.withColumn("rho_max", chk)
    # alpha_m * m^2 * 2^33 as ONE python-computed double literal,
    # embedded identically in the SQL oracle via hll_estimate_sql
    c = (0.7213 / (1.0 + 1.079 / m)) * m * m * 8589934592.0
    agg = registers.groupBy(*group_cols).agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 33 - rho_max)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(8589934592)
        ).alias("_t"),
        (F.lit(m) - F.count(F.lit(1))).alias("_v"),
    )
    raw = F.lit(c) / F.col("_t").cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("_v").cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (F.col("_v") > 0), lc).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est, 0).cast("bigint").alias(out_col)
    )


def hll_estimate_sql(
    registers_sql: str, group_expr: str, p: int = 12
) -> str:
    """SQL text computing the same estimate from a register relation
    ``(group, bucket, rho_max)`` named by ``registers_sql`` — the
    oracle twin of :func:`hll_estimate` (identical literals, identical
    op order)."""
    m = 1 << p
    c = (0.7213 / (1.0 + 1.079 / m)) * m * m * 8589934592.0
    return f"""
        SELECT {group_expr},
               CAST(ROUND(CASE WHEN ({c!r} / CAST(_t AS DOUBLE)) <= {2.5 * m!r}
                                AND _v > 0
                               THEN {float(m)!r} * ln({float(m)!r} / CAST(_v AS DOUBLE))
                               ELSE {c!r} / CAST(_t AS DOUBLE) END)
                    AS BIGINT) AS approx_distinct
        FROM (
            SELECT {group_expr},
                   SUM(CAST(1 AS BIGINT) << (33 - rho_max))
                     + ({m} - COUNT(*)) * 8589934592 AS _t,
                   {m} - COUNT(*) AS _v
            FROM {registers_sql} GROUP BY {group_expr}
        )
    """
