"""Blocked fuzzy (edit-distance) join — entity-resolution style string
matching without the n² cross product.

The reference repo has no fuzzy matching; this extends its cleaning
surface (SURVEY.md §2.11): the cleaners normalize individual values,
a fuzzy join finds records whose *normalized* values still differ by
typos — the standard record-linkage step after cleaning.

Scale posture: candidate pairs are generated only WITHIN a blocking
key (classic ER blocking — Fellegi-Sunter style pipelines), so the
join co-partitions both sides on the block and the pair count is
sum(block_size²) instead of n². Blocking is a documented recall
trade-off: pairs whose blocking keys differ are never compared. At
100 TB you block on a cheap high-selectivity key (brand, zip,
sorted-neighborhood window) and keep the biggest block bounded; the
block key is a uniform shuffle key, and `levenshtein()` runs
JVM-side per candidate pair (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """All (id_a < id_b) pairs in the same block whose ``text_col``
    values are within ``max_distance`` edits.

    Spark's ``levenshtein(l, r, threshold)`` 3-arg form short-circuits
    the DP once the threshold is exceeded (Spark 3.5+) — the per-pair
    cost is O(len·threshold), not O(len²). It returns -1 for
    over-threshold pairs, so the keep-filter is ``0 <= d <= max``,
    never a bare ``d <= max``."""
    sides = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        F.col(block_col).alias("block"),
    )
    a, b = sides.alias("a"), sides.alias("b")
    dist = F.levenshtein(F.col("a.txt"), F.col("b.txt"), max_distance)
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.txt").alias("txt_a"),
            F.col("b.txt").alias("txt_b"),
            dist.alias("distance"),
        )
        .filter(F.col("distance").between(0, max_distance))
    )


def edit_distance(left: Column | str, right: Column | str) -> Column:
    """Plain (unbounded) Levenshtein distance, exposed for scoring."""
    l = F.col(left) if isinstance(left, str) else left
    r = F.col(right) if isinstance(right, str) else right
    return F.levenshtein(l, r)


def sorted_neighborhood_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 4,
    prefix_len: int = 2,
    max_distance: int = 2,
) -> DataFrame:
    """Sorted-neighborhood (SNM) fuzzy self-join — the complementary
    blocking strategy to :func:`fuzzy_self_join`'s equality blocks:
    instead of requiring an exact blocking key, sort records by the
    match text and compare each record only to its ``window`` sorted
    neighbors, so near-matches with NO shared exact key still pair as
    long as they sort nearby.

    Scale shape: the sort is PARTITIONED by a text prefix (``prefix_len``
    chars) — each prefix block sorts and slides independently, one
    shuffle on the prefix, no global sort. Candidate pairs per record
    <= window (lead() over the sorted block), each verified with the
    thresholded JVM levenshtein. The blocking recall trade-off moves:
    typos in the PREFIX now break pairing (vs any-key-difference for
    equality blocks) — production stacks run both passes and union.

    Output matches fuzzy_self_join: (id_a, id_b, txt_a, txt_b,
    distance), id_a < id_b, each qualifying pair exactly once."""
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_pfx"),
    )
    w = Window.partitionBy("_pfx").orderBy("txt", "id")
    # window functions first, generator second: Spark rejects a window
    # expression inside the explode projection
    with_leads = base.select(
        "id",
        "txt",
        *[F.lead("id", i).over(w).alias(f"_nid{i}") for i in range(1, window + 1)],
        *[F.lead("txt", i).over(w).alias(f"_ntxt{i}") for i in range(1, window + 1)],
    )
    neighbors = F.array(*[
        F.struct(F.col(f"_nid{i}").alias("nid"), F.col(f"_ntxt{i}").alias("ntxt"))
        for i in range(1, window + 1)
    ])
    # each unordered pair arises exactly once (both members share a
    # prefix block; lead(i) pairs a row with its i-th successor only),
    # so canonicalizing (id_a < id_b) needs a conditional swap, not a
    # distinct pass
    a_first = F.col("id") < F.col("_nb.nid")
    pairs = (
        with_leads.select("id", "txt", F.explode(neighbors).alias("_nb"))
        .filter(F.col("_nb.nid").isNotNull())
        .select(
            F.when(a_first, F.col("id")).otherwise(F.col("_nb.nid")).alias("id_a"),
            F.when(a_first, F.col("_nb.nid")).otherwise(F.col("id")).alias("id_b"),
            F.when(a_first, F.col("txt")).otherwise(F.col("_nb.ntxt")).alias("txt_a"),
            F.when(a_first, F.col("_nb.ntxt")).otherwise(F.col("txt")).alias("txt_b"),
        )
    )
    dist = F.levenshtein(F.col("txt_a"), F.col("txt_b"), max_distance)
    return pairs.withColumn("distance", dist).filter(
        F.col("distance").between(0, max_distance)
    )
