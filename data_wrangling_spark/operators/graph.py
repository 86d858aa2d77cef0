"""Iterative graph operator: connected components by min-label
propagation — the clustering step that turns near-duplicate PAIRS
(MinHash/SimHash output, operators/dedup.py) into duplicate GROUPS with
one canonical representative each. The reference stores its way→node
graph purely relationally (SURVEY.md §1.1) and never traverses it; a
dedup pipeline must.

Algorithm: every node starts labeled with its own id; each round, a node
takes the min label among itself and its neighbors; converged when no
label changes. Rounds needed = graph diameter (near-dup clusters are
small and dense, so typically 2-4).

Scale shape per round: one shuffle join (edges ⨝ labels on the edge
endpoint) + one groupBy-min — both hash-partitioned on node id, so AQE
reuses the partitioning. ``localCheckpoint`` truncates the lineage each
round (an iterative plan otherwise grows unboundedly and re-executes
from scratch); the driver-side loop only ever pulls one scalar (the
converged? count) per round, never data. This is the standard
Pregel-style pattern (GraphX/GraphFrames do the same under the hood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, component) with component = min node id reachable
    (min in the id column's natural ordering — works for numeric AND
    string ids; no cast, so non-numeric ids are never silently nulled).

    ``edges`` is undirected input (each pair listed once is enough);
    isolated nodes don't appear (callers union them in if needed).

    Raises RuntimeError if labels have not converged after ``max_iter``
    rounds (rounds needed = graph diameter) — a partially-propagated
    result would silently split real components.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("neighbor_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce("neighbor_component", F.col("component")),
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter); raise max_iter — a partial "
        "result would silently split real components"
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Collapse near-duplicate pairs into clusters: (id, cluster_id)
    where cluster_id is the cluster's min member id — the canonical
    'keep' representative for dedup."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    return comp.select(F.col("id"), F.col("component").alias("cluster_id"))
