"""Streaming sessionization (applyInPandasWithState) vs the batch
window-based ``sessionize``: every session the stream emits must be
byte-identical to a batch session, and every batch session that closed
safely before the final watermark must have been emitted."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_wrangling_spark.operators.temporal import sessionize
from data_wrangling_spark.sources.tables import load_table
from data_wrangling_spark.streaming.events import sessionize_stream
from tests.conftest import SF_DIR

GAP_MIN = 30
WATERMARK_MIN = 30


def test_stream_matches_batch_sessions(spark):
    streamed = sessionize_stream(
        spark, SF_DIR, gap_minutes=GAP_MIN, watermark=f"{WATERMARK_MIN} minutes",
        table_name="t_stream_sessions",
    ).collect()
    batch = sessionize(
        load_table(spark, SF_DIR, "events"), key="user_id", ts="ts",
        gap_minutes=GAP_MIN, order_tiebreak="event_id",
    ).collect()

    got = {(r.user_id, r.session_start, r.session_end, r.n_events) for r in streamed}
    want = {(r.user_id, r.session_start, r.session_end, r.n_events) for r in batch}

    # soundness: nothing emitted that batch doesn't agree with
    assert got <= want, f"stream emitted non-batch sessions: {sorted(got - want)[:3]}"

    # completeness: sessions closed strictly before the final watermark
    # (max_ts - watermark) by more than the gap MUST have been emitted
    max_ts = load_table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(minutes=WATERMARK_MIN + GAP_MIN)
    must_emit = {s for s in want if s[2] < cutoff}
    missing = must_emit - got
    assert not missing, f"{len(missing)} closed sessions not emitted: {sorted(missing)[:3]}"
    # and the stream emitted the vast bulk of all sessions
    assert len(got) >= 0.9 * len(want)
