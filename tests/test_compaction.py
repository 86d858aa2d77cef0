"""compact_parquet: shrinks a many-small-files landing zone to size-
targeted files without losing rows, and grows file count (repartition
path) when asked for smaller targets than the input."""

from __future__ import annotations

from pathlib import Path

from data_wrangling_spark.sinks import compact_parquet


def _parquet_files(path: str) -> list[Path]:
    return [p for p in Path(path).rglob("*.parquet")]


def test_compact_shrinks_small_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(10_000).withColumnRenamed("id", "k")
    df.repartition(16).write.parquet(src)
    assert len(_parquet_files(src)) == 16

    n = compact_parquet(spark, src, dst)  # 10k longs << 128 MB target
    assert n == 1
    assert len(_parquet_files(dst)) == 1
    assert spark.read.parquet(dst).count() == 10_000
    assert sorted(
        r.k for r in spark.read.parquet(dst).collect()
    ) == list(range(10_000))


def test_compact_respects_target_size(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(50_000).write.parquet(src)
    total = sum(p.stat().st_size for p in _parquet_files(src))
    # target a third of the input -> 3 output files (repartition path
    # if the input had fewer partitions)
    n = compact_parquet(spark, src, dst, target_file_bytes=total // 3 + 1)
    assert n == 3
    assert len(_parquet_files(dst)) == 3
    assert spark.read.parquet(dst).count() == 50_000


def test_compact_refuses_dst_equals_src(spark, tmp_path):
    """Overwrite-while-lazily-reading the same path would truncate the
    landing zone before the scan runs (ADVICE r2) — must refuse."""
    import pytest

    from data_wrangling_spark.sinks import compact_parquet

    src = str(tmp_path / "zone")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="dst == src"):
        compact_parquet(spark, src, src)
    # path-spelling variants of the same location are also refused
    with pytest.raises(ValueError, match="dst == src"):
        compact_parquet(spark, src, src + "/")
    # the input survived
    assert spark.read.parquet(src).count() == 10
