"""Z-order (Morton curve) data layout — multi-column scan pruning.

A table sorted by one column prunes scans on that column only: every
file spans the full range of every OTHER column. Interleaving the bits
of k rank-bucketed columns into one sort key clusters rows so each file
covers a small hyper-rectangle — parquet footer min/max stats then prune
point/range predicates on ANY of the k columns to ~N^((k-1)/k) of the
files instead of all of them. This is the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, built here from plain Spark expressions.

Scale posture: bucketing + bit interleaving are narrow JVM expressions;
the only shuffle is the final ``repartitionByRange`` on the z-value
(exactly the one shuffle any re-layout requires), and the column bounds
come from one min/max aggregate (a layout-time control-plane action).
Uniform linear bucketing is used between the observed bounds — for
heavily skewed columns substitute quantile boundaries (approxQuantile)
for the linear scale; the interleave is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 10  # buckets per column = 1024


def interleave_bits(cols: list[Column], bits: int = BITS) -> Column:
    """Morton interleave: bit b of column i lands at position b*k + i.
    Inputs must already be integer bucket ordinals in [0, 2^bits)."""
    k = len(cols)
    if bits * k > 63:
        # JVM shiftleft wraps the shift amount mod 64 and position 63 is
        # the long sign bit — exceeding 63 would silently corrupt the
        # curve (bits colliding / sign flips breaking range order)
        raise ValueError(
            f"bits*len(cols) = {bits * k} exceeds 63 — reduce bits "
            f"(e.g. bits={63 // k}) for {k} columns"
        )
    z: Column = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        c = c.cast("long")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + i)
            )
    return z


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = BITS
) -> tuple[DataFrame, str]:
    """Attach the z-value column (name returned) for ``cols``, linearly
    bucketing each column between its observed min/max."""
    if "_z" in df.columns:
        raise ValueError("'_z' is reserved by zorder_value")
    bounds = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    ).first()
    buckets = []
    for c in cols:
        if bounds[f"min_{c}"] is None or bounds[f"max_{c}"] is None:
            raise ValueError(
                f"cannot z-order on '{c}': no non-null values (empty "
                "input or all-null column)"
            )
        lo, hi = float(bounds[f"min_{c}"]), float(bounds[f"max_{c}"])
        span = (hi - lo) or 1.0
        scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit((1 << bits) - 1)
        buckets.append(F.round(scaled).cast("long"))
    return df.withColumn("_z", interleave_bits(buckets, bits)), "_z"


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int, bits: int = BITS
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Morton
    curve over ``cols``: range-partition by z-value (contiguous curve
    segments per file) and sort within each file so row-group stats are
    tight too."""
    zdf, zcol = zorder_value(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )
