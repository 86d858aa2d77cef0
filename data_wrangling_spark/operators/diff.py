"""Corpus snapshot diff — change detection between two versions of a
document table, the primitive an incremental training-data pipeline
runs before reprocessing anything: which documents are new, which
vanished, which changed content, which are untouched.

Scale shape: each side reduces to (id, content-fingerprint) — a NARROW
md5 projection, no text leaves the scan — then ONE full-outer equi
join on the id. No window, no collect; at 100 TB this is the cheapest
possible two-snapshot comparison (the same content-addressing
discipline as operators/splits.py and the exact-dedup family).

Reference scope: the reference pipeline (S2) is a one-shot batch
script with no notion of snapshots; §2.10/§2.11 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_wrangling_spark.functions.text import fingerprint


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document diff of two corpus snapshots. Returns
    (id_col, status) with status in {'added', 'removed', 'changed',
    'unchanged'}: added = id only in ``new``, removed = only in
    ``old``, changed = present in both with different normalized
    content fingerprints (functions/text.py fingerprint — so
    whitespace-only edits count as unchanged, same normalization as
    exact dedup), else unchanged.

    NULL text fingerprints NULL; a NULL on either side of a present
    pair compares as changed unless both are NULL (null-safe
    equality), matching the intuition that text -> NULL is a change."""
    o = old.select(
        F.col(id_col).alias("_id"), fingerprint(text_col).alias("_ofp")
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        F.col(id_col).alias("_id"), fingerprint(text_col).alias("_nfp")
    ).withColumn("_in_new", F.lit(True))
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_ofp").eqNullSafe(F.col("_nfp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("_id").alias(id_col), status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Status counts for the diff — the four-row dashboard number. One
    extra hash aggregate over the diff's (id, status) rows."""
    return (
        snapshot_diff(old, new, id_col, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
