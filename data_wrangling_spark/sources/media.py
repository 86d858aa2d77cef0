"""Binary media ingest — the real Spark source behind the multimodal
pipeline (SURVEY.md §2.11 X-MULTIMODAL).

``spark.read.format("binaryFile")`` is Spark's built-in whole-file
binary source: each file becomes one row (path, modificationTime,
length, content) read in parallel across executors — the correct ingest
for image/audio/video corpora stored as object-store files. This module
maps it onto the canonical media schema (operators/multimodal.py
MEDIA_SCHEMA) so every downstream media op (feature extraction, resize,
frame sampling) composes unchanged.

Scale notes: binaryFile caps per-task bytes via
``spark.sql.files.maxPartitionBytes`` (whole files are never split —
one file one row); for corpora of many small media files, compact
upstream (sinks.compact_parquet after conversion) or ingest into a
payload-column parquet table once and scan that thereafter, which is
exactly what ``to_media_table`` enables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Read a directory of binary files as a MEDIA_SCHEMA-shaped table:
    media_id = xxhash64(file path) (stable across re-reads), payload =
    file bytes, payload_uri = the source path, metadata from file stats.
    ``glob`` filters files (pushed into the listing, not a post-scan
    filter)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("payload"),
        F.col("path").alias("payload_uri"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("length").alias("n_bytes"),
        ).alias("meta"),
    )


def to_media_table(media: DataFrame, out_dir: str) -> None:
    """Persist ingested media as a payload-column parquet table — the
    scan-efficient layout for repeated pipeline runs (one splittable
    columnar table instead of re-listing millions of small files)."""
    media.write.mode("overwrite").parquet(out_dir)
