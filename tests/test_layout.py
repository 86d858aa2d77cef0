"""Z-order layout: Morton interleave correctness and the pruning
property it exists for — parquet footer min/max stats must narrow a
single-column probe to a small fraction of files on EITHER z-ordered
column, where a linear sort narrows only its own column."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_wrangling_spark.operators.layout import interleave_bits, write_zordered

N_FILES = 16


def test_interleave_known_values(spark):
    # x=0b11, y=0b01 -> z bits (y1 x1 y0 x0) = (0 1 1 1) = 7
    df = spark.range(1).select(F.lit(3).alias("x"), F.lit(1).alias("y"))
    z = df.select(
        interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z")
    ).first().z
    assert z == 0b0111

    # single column degenerates to identity
    df = spark.range(10)
    vals = [
        r.z
        for r in df.select(interleave_bits([F.col("id")], bits=4).alias("z")).collect()
    ]
    assert vals == list(range(10))


def _files_matching(path: str, col: str, probe: int) -> int:
    """Files whose footer [min,max] for ``col`` could contain probe."""
    n = 0
    for f in Path(path).rglob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None and lo <= probe <= hi:
            n += 1
    return n


def test_zorder_prunes_both_columns(spark, tmp_path):
    # two independent uniform columns — the worst case for linear sort
    df = spark.range(40_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1024)).alias("x"),
        F.pmod(F.xxhash64(F.col("id") + 7_777_777), F.lit(1024)).alias("y"),
    )
    linear, zord = str(tmp_path / "linear"), str(tmp_path / "zorder")
    (
        df.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.parquet(linear)
    )
    write_zordered(df, zord, ["x", "y"], n_files=N_FILES)

    assert len(list(Path(zord).rglob("*.parquet"))) == N_FILES
    # several probes: repartitionByRange samples its boundaries, so a
    # single probe can land on a file straddling a quadrant edge —
    # the property is statistical, the asserts use the average
    probes = [200, 512, 800]
    lin_x = [_files_matching(linear, "x", p) for p in probes]
    lin_y = [_files_matching(linear, "y", p) for p in probes]
    z_x = [_files_matching(zord, "x", p) for p in probes]
    z_y = [_files_matching(zord, "y", p) for p in probes]

    assert max(lin_x) <= 3             # linear sort prunes its own column hard
    assert lin_y == [N_FILES] * 3      # ...and not at all on the other column
    # z-order prunes BOTH columns (ideal ~sqrt(N)=4; sampled range
    # boundaries blur it, so bound the average at N*5/8 and require
    # strictly-better-than-no-pruning on every probe)
    assert sum(z_x) / 3 <= N_FILES * 5 / 8, (z_x, z_y)
    assert sum(z_y) / 3 <= N_FILES * 5 / 8, (z_x, z_y)
    assert all(v < N_FILES for v in z_x + z_y), (z_x, z_y)
    # and rows survive the relayout intact
    assert spark.read.parquet(zord).count() == 40_000


def test_interleave_rejects_over_63_bits(spark):
    import pytest

    with pytest.raises(ValueError, match="exceeds 63"):
        interleave_bits([F.lit(1)] * 7, bits=10)


def test_zorder_all_null_column_clear_error(spark):
    import pytest

    from data_wrangling_spark.operators.layout import zorder_value

    df = spark.range(5).select(F.lit(None).cast("long").alias("x"), "id")
    with pytest.raises(ValueError, match="no non-null values"):
        zorder_value(df, ["x", "id"])
