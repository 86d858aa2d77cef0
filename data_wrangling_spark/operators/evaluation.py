"""Classifier-evaluation operators (X-TEXT extension surface): exact
distributed ROC-AUC and precision/recall threshold sweeps for the
quality filters a curation pipeline trains and calibrates.

Why these live in the engine: at corpus scale "evaluate the quality
classifier" is itself a big-data job — hundreds of billions of scored
documents against weak labels — and the naive formulations (sort all
scores, or pair positives with negatives) are a global sort funnel or
an O(P·N) blow-up. Both operators here reduce to ONE hash aggregate on
(group, score) — map-side partials collapse every task's output to the
score vocabulary — followed by windows over the per-group DISTINCT
score table, which is SCORE-DOMAIN-bounded (integer-milli scores →
at most ~2M rows per group, independent of corpus size), never
row-bounded.

Reference scope: the reference pipeline (S2) has no model-evaluation
stage at all; this is part of the §2.10/§2.11 training-data extension
surface. Everything is exact integer arithmetic plus one final double
division, so plain-SQL oracles replay the values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    score_col: str | Column,
    label_col: str | Column,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC-AUC per group via the Mann-Whitney U statistic with
    midrank tie handling (identical to the trapezoidal area under the
    empirical ROC curve):

        AUC = Σ_s  p(s) · (N_below(s) + n(s)/2)  /  (P · N)

    where p(s)/n(s) are the positive/negative counts at distinct score
    s and N_below(s) the negatives strictly below s. Computed in
    doubled integer units (num2 = Σ p·(2·N_below + n), AUC = num2 /
    (2·P·N)). num2 ≈ 2·P·N can exceed int64 at ~4.6e18 pairs (a few
    billion positives × a few billion negatives), so it accumulates in
    decimal(38,0) — exact to 10^38 pairs, far past any corpus — rather
    than a silently-wrapping long (advisor find, round 8). The only
    float op is ONE final division of exact integers — engine-portable
    to the last ulp while 2·P·N < 2^53 (beyond that the division is
    correctly rounded but no longer integer-exact; AUC error stays
    ~1e-9).

    ``label_col`` must evaluate to 1/0 (or boolean — cast applied).
    Rows with a NULL score are dropped up front in BOTH the grouped and
    ungrouped paths (a NULL score has no rank; previously the grouped
    window silently ranked them NULLS FIRST while the ungrouped
    prefix-sum path raised — advisor find, round 8). Returns
    (group_cols..., n_pos, n_neg, auc_micro) with auc_micro =
    round(1e6 · AUC); groups with zero positives or zero negatives are
    dropped (AUC undefined).

    Scale shape: one (group, score) hash aggregate — the ONLY pass over
    the data — then a cumulative window over the per-group DISTINCT
    score rows, bounded by the score domain (quantize wide-domain
    scores first: integer-milli is the house discipline), then a
    per-group reduce. No sort of the corpus, no P×N pairing. The
    UNGROUPED form has no partition key to window on, so it computes
    the running negative count with the two-pass distributed prefix sum
    (operators/prefix.py) instead of a single-partition global window —
    which makes it EAGER at build (two tiny control aggregates) and
    scale-safe even on un-quantized score domains.
    """
    group_cols = group_cols or []
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    y = label.cast("int")
    counted = (
        df.select(*group_cols, score.alias("_s"), y.alias("_y"))
        .filter(F.col("_s").isNotNull())
        .groupBy(*group_cols, "_s")
        .agg(
            F.sum("_y").cast("long").alias("_p"),
            F.sum(1 - F.col("_y")).cast("long").alias("_n"),
        )
    )
    if group_cols:
        w = (
            Window.partitionBy(*group_cols)
            .orderBy("_s")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum = counted.withColumn(
            "_nb", F.coalesce(F.sum("_n").over(w), F.lit(0))
        )
    else:
        from data_wrangling_spark.operators.prefix import prefix_sum

        # exclusive running count = inclusive prefix sum minus own count
        cum = prefix_sum(counted, "_s", "_n", out_col="_cum").withColumn(
            "_nb", F.col("_cum") - F.col("_n")
        )
    agg = cum.groupBy(*group_cols).agg(
        F.sum("_p").alias("_P"),
        F.sum("_n").alias("_N"),
        F.sum(
            F.col("_p").cast("decimal(38,0)")
            * (2 * F.col("_nb") + F.col("_n")).cast("decimal(38,0)")
        ).alias("_num2"),
    )
    return agg.filter((F.col("_P") > 0) & (F.col("_N") > 0)).select(
        *group_cols,
        F.col("_P").cast("long").alias("n_pos"),
        F.col("_N").cast("long").alias("n_neg"),
        F.round(
            (F.lit(1000000.0) * F.col("_num2"))
            / (F.lit(2.0) * F.col("_P") * F.col("_N"))
        )
        .cast("long")
        .alias("auc_micro"),
    )


def pr_at_thresholds(
    df: DataFrame,
    score_col: str | Column,
    label_col: str | Column,
    thresholds: list[int],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Precision / recall / F1 at each fixed score threshold (predict
    positive when score >= t) — the filter-calibration sweep that picks
    a curation cutoff. Returns one row per (group..., threshold):
    (threshold, n_pred_pos, tp, precision_micro, recall_micro,
    f1_micro), integer-micro ratios via one double division each.

    Same single-aggregate scale shape as :func:`roc_auc`: the (group,
    score) vocabulary table is computed ONCE and each threshold reduces
    it with a conditional sum — the corpus is never re-scanned per
    threshold (``thresholds`` is a literal list, O(|t|·vocab) work on
    vocabulary-bounded rows). Degenerate cells (no predicted positives
    / no actual positives) yield NULL precision/recall and are kept, so
    a sweep over an aggressive threshold is visible instead of silently
    dropped. ``thresholds`` is deduplicated up front: a duplicated
    threshold would explode two identical rows that collapse into one
    (group, threshold) group and double every count (advisor find,
    round 8). NULL-score rows are DROPPED up front, matching
    :func:`roc_auc`'s round-8 policy (advisor find, round 9: keeping
    them made ``NULL >= t`` never count in n_pred_pos/tp while their
    positives still counted in the recall denominator, silently
    deflating recall/F1 at every threshold).
    """
    group_cols = group_cols or []
    thresholds = sorted({int(t) for t in thresholds})
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    counted = (
        df.select(*group_cols, score.alias("_s"), label.cast("int").alias("_y"))
        .filter(F.col("_s").isNotNull())
        .groupBy(*group_cols, "_s")
        .agg(
            F.sum("_y").cast("long").alias("_p"),
            F.count(F.lit(1)).cast("long").alias("_c"),
        )
    )
    thr = F.explode(
        F.array(*[F.lit(int(t)) for t in thresholds])
    ).alias("threshold")
    cells = counted.select(*group_cols, "_s", "_p", "_c", thr)
    agg = cells.groupBy(*group_cols, "threshold").agg(
        F.sum(F.when(F.col("_s") >= F.col("threshold"), F.col("_c"))
              .otherwise(F.lit(0))).alias("_pred"),
        F.sum(F.when(F.col("_s") >= F.col("threshold"), F.col("_p"))
              .otherwise(F.lit(0))).alias("_tp"),
        F.sum("_p").alias("_P"),
    )
    prec = (F.lit(1000000.0) * F.col("_tp")) / F.col("_pred")
    rec = (F.lit(1000000.0) * F.col("_tp")) / F.col("_P")
    f1 = (F.lit(2000000.0) * F.col("_tp")) / (F.col("_pred") + F.col("_P"))
    return agg.select(
        *group_cols,
        "threshold",
        F.col("_pred").cast("long").alias("n_pred_pos"),
        F.col("_tp").cast("long").alias("tp"),
        F.when(F.col("_pred") > 0, F.round(prec).cast("long"))
        .alias("precision_micro"),
        F.when(F.col("_P") > 0, F.round(rec).cast("long"))
        .alias("recall_micro"),
        F.when(
            (F.col("_pred") + F.col("_P")) > 0, F.round(f1).cast("long")
        ).alias("f1_micro"),
    )
