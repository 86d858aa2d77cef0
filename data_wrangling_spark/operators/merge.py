"""Merge / upsert — the SCD1 write-path primitive (MERGE INTO shaped).

Extension surface (SURVEY.md §2.11): the reference rebuilds its SQLite
tables from scratch on every run (S2 full-file import); a production
engine maintaining a 100 TB table needs the incremental form — apply a
batch of updates/inserts keyed by primary key without rewriting
unchanged data.

Scale posture: ``merge_upsert`` is one left-anti shuffle join on the key
(Catalyst broadcasts the update side when it is small — the common case
for incremental batches) plus a union; nothing is collected. On a
partitioned table the companion pattern is dynamic partition overwrite
(``spark.sql.sources.partitionOverwriteMode=dynamic``) so only the
partitions containing updated keys are rewritten — see
tests/test_merge.py for the end-to-end parquet round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, updates: DataFrame, key: str | list[str]) -> DataFrame:
    """SCD1 merge: rows of ``target`` whose ``key`` appears in
    ``updates`` are replaced by the update row; update rows with new keys
    are inserted; all other target rows pass through unchanged. The
    update side must be key-unique (last-writer-wins ordering is the
    caller's job — this operator is deterministic only for unique keys).

    Both sides must share the same column set; output column order
    follows ``target``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            "merge_upsert: column sets differ: "
            f"target-only={sorted(set(target.columns) - set(updates.columns))}, "
            f"updates-only={sorted(set(updates.columns) - set(target.columns))}"
        )
    kept = target.join(updates.select(keys), keys, "left_anti")
    return updates.select(target.columns).unionByName(kept)
