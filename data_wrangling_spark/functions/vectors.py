"""Vector ops over ``array<float>`` embedding columns (SURVEY.md §2.11
X-SIM-SEARCH).

Built-in higher-order functions only (zip_with / aggregate / transform) —
JVM-side, no Python boundary. Dot products accumulate in DOUBLE in array
order, which matches DuckDB's list_dot_product on a DOUBLE[] cast, so
oracle hashes agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-order double-precision dot product.

    zip_with + aggregate, deliberately: measured 3-8x faster than the
    "allocation-free" element_at-by-index formulation (codegen'd array
    ops beat per-element ordinal lookups)."""
    prods = F.zip_with(
        _c(a).cast("array<double>"), _c(b).cast("array<double>"), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    v = _c(a).cast("array<double>")
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """NULL (not a crash) for zero-norm vectors: Spark 4's default ANSI
    mode raises DIVIDE_BY_ZERO even for double division, and all-zero
    embeddings (padding / missing-embedding sentinels) do occur in real
    corpora. NULL scores sort last under desc ranking and fail every
    >= threshold filter, which is the wanted behavior."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def quantize_scale(a: Column | str) -> Column:
    """Per-vector symmetric int8 quantization scale: max(|x|)/127.
    NULL for all-zero vectors (nothing to quantize; try_divide keeps
    ANSI mode from raising)."""
    v = _c(a).cast("array<double>")
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # nullif: an all-zero vector must yield NULL scale (0.0 would make
    # every q element a 0/0 try_divide NULL anyway, but a 0.0 scale
    # masquerades as meaningful downstream — dequantize would emit 0s
    # indistinguishable from real zeros)
    return F.nullif(max_abs, F.lit(0.0)) / F.lit(127.0)


def quantize_int8(a: Column | str, scale: Column | None = None) -> Column:
    """Symmetric int8 quantization: round(x/scale) in [-127, 127] —
    the 4x-smaller storage/bandwidth form ANN serving uses; dequantize
    is q*scale. Whole vector stays a JVM higher-order expression.

    Pass a pre-PROJECTED ``scale`` column on hot paths: higher-order
    lambdas get no common-subexpression elimination, so an inlined
    scale expression (array_max over the full vector) would re-execute
    per ELEMENT — O(d^2) per vector at production dims."""
    v = _c(a).cast("array<double>")
    s = scale if scale is not None else quantize_scale(a)
    return F.transform(v, lambda x: F.round(F.try_divide(x, s)).cast("int"))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        _c(a).cast("array<double>"), _c(b).cast("array<double>"), lambda x, y: x - y
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x * x))
