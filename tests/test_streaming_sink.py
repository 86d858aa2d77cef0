"""Durable streaming sink: foreachBatch → date-partitioned parquet with
dynamic partition overwrite. Running the stream TWICE (fresh checkpoints,
modeling a full redelivery) must leave exactly the batch-equivalent
result — the idempotence property that upgrades at-least-once delivery
to effectively-once output."""

from __future__ import annotations

from data_wrangling_spark.sources.tables import load_table
from data_wrangling_spark.streaming.events import (
    windowed_counts_to_parquet,
    windowed_event_counts,
)
from tests.conftest import SF_DIR


def test_foreachbatch_parquet_sink_idempotent(spark, tmp_path):
    out = str(tmp_path / "counts")
    windowed_counts_to_parquet(spark, SF_DIR, out, str(tmp_path / "ck1"))
    windowed_counts_to_parquet(spark, SF_DIR, out, str(tmp_path / "ck2"))  # replay

    got = sorted(
        (r.window_start, r.type, r.cnt)
        for r in spark.read.parquet(out).select("window_start", "type", "cnt").collect()
    )
    want = sorted(
        (r.window_start, r.type, r.cnt)
        for r in windowed_event_counts(load_table(spark, SF_DIR, "events")).collect()
    )
    assert got == want
    # partition layout is real: date=... directories exist
    files = spark.read.parquet(out).select("date").distinct().count()
    assert files >= 1
