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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 15,
) -> DataFrame:
    """PageRank over a directed edge list: (id, rank), sum of ranks = 1.
    Fixed iteration count (the standard practice; convergence-delta
    stopping adds a per-round action for little gain at ~15 rounds).

    Scale shape per round — the same Pregel-style contract as
    :func:`connected_components`: one shuffle join (ranks ⨝ edges on
    src) + one groupBy-sum on dst, both hash-partitioned on node id;
    ``localCheckpoint`` truncates the otherwise-exponentially-growing
    iterative lineage. Dangling nodes (no out-edges) redistribute their
    mass uniformly — computed as (1 - Σ flowed mass), one scalar-free
    broadcast-joined aggregate, keeping Σrank = 1 exactly instead of
    leaking mass each round.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # pre-join degree once; per-round joins then only touch (id, rank)
    flow_edges = e.join(out_deg, "src").localCheckpoint(eager=True)

    n = nodes.count()  # control-plane scalar, once
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))  # empty, right schema
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for _ in range(n_iter):
        contrib = (
            flow_edges.join(ranks, flow_edges.src == ranks.id)
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("flowed"))
            # materialize once: contrib feeds BOTH the flowed_total agg
            # and the rank join — unpinned, each round would execute the
            # join+aggregate subtree twice
            .localCheckpoint(eager=True)
        )
        # dangling mass = what didn't flow through any edge this round
        flowed_total = contrib.agg(F.sum("flowed").alias("t"))
        new_ranks = (
            ranks.join(contrib, ranks.id == contrib.dst, "left")
            .crossJoin(F.broadcast(flowed_total))
            .select(
                "id",
                (
                    F.lit((1 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce("flowed", F.lit(0.0))
                        + (F.lit(1.0) - F.coalesce("t", F.lit(0.0))) / F.lit(n)
                    )
                ).alias("rank"),
            )
        )
        ranks = new_ranks.localCheckpoint(eager=True)
    return ranks


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
