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
    deflating recall/F1 at every threshold). NULL-label rows are
    dropped too (round 11, same policy as calibration_bins).
    """
    group_cols = group_cols or []
    thresholds = sorted({int(t) for t in thresholds})
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    counted = (
        df.select(*group_cols, score.alias("_s"), label.cast("int").alias("_y"))
        # NULL labels dropped too (round 11): they counted in _c (so in
        # n_pred_pos) but not _p, deflating precision — the same hazard
        # the round-10 advisor flagged in calibration_bins. roc_auc
        # already drops them implicitly (both its sums skip NULLs).
        .filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
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


def calibration_bins(
    df: DataFrame,
    score_col: str | Column,
    label_col: str | Column,
    n_bins: int = 10,
    lo: int = 0,
    hi: int = 1000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Reliability table (calibration-diagram bins) for an integer
    score against a binary label — the third leg of the evaluation
    tripod next to :func:`roc_auc` (ranking) and
    :func:`pr_at_thresholds` (cutoffs): AUC can be perfect while the
    scores are wildly miscalibrated, and a curation pipeline that
    thresholds on "probability-like" quality scores needs to know the
    score→empirical-rate mapping before trusting the threshold.

    Scores (integer units, e.g. milli) are binned uniformly over
    [lo, hi): bin = floor((s - lo) · n_bins / (hi - lo)), clamped into
    [0, n_bins) so out-of-range scores land in the edge bins rather
    than vanishing. Returns one row per (group..., bin) with
    (bin, bin_lo, n, n_pos, conf_micro, acc_micro, gap_micro):

    - ``conf_micro`` — the bin's mean score normalized onto [0, 1] as
      round(1e6 · (Σs − n·lo) / (n · (hi − lo))): exact integers in,
      ONE double division out (the module's engine-exactness
      discipline);
    - ``acc_micro``  — round(1e6 · n_pos / n), the empirical positive
      rate;
    - ``gap_micro``  — |acc − conf| computed from the two
      ALREADY-ROUNDED micros, so it is exact integer arithmetic and
      Σ n·gap / N (the expected calibration error,
      :func:`calibration_error`) replays bit-for-bit on any engine.

    Scale shape: ONE (group, bin) hash aggregate is the only pass over
    the data — the bin index is codegen scalar arithmetic on the score
    column, map-side partials collapse each task's output to
    group·n_bins cells, and everything after the aggregate runs on a
    control-plane-sized relation. NULL-score AND NULL-label rows are
    dropped up front (the roc_auc / pr_at_thresholds round-9 policy —
    before round 11 a NULL label was counted in n but skipped by the
    n_pos sum, silently deflating acc_micro); empty bins emit
    no row (a reliability diagram reads missing cells as "no data",
    and synthesizing zero rows would need a bins×groups grid join that
    serves no downstream consumer).
    """
    if hi <= lo:
        raise ValueError(f"calibration_bins: hi ({hi}) must exceed lo ({lo})")
    if n_bins < 1:
        raise ValueError(f"calibration_bins: n_bins ({n_bins}) must be >= 1")
    group_cols = group_cols or []
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    # bin from the RENAMED projection column (_s), not the caller's
    # expression — the bin is computed after the select below
    raw_bin = F.floor(
        (F.col("_s") - F.lit(int(lo)))
        * F.lit(int(n_bins))
        / F.lit(float(hi - lo))
    )
    bin_ = F.least(F.greatest(raw_bin, F.lit(0)), F.lit(int(n_bins) - 1))
    agg = (
        df.select(
            *group_cols,
            score.cast("long").alias("_s"),
            label.cast("int").alias("_y"),
        )
        .filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
        .withColumn("_b", bin_.cast("long"))
        .groupBy(*group_cols, "_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("_y").cast("long").alias("_p"),
            F.sum("_s").cast("long").alias("_ss"),
        )
    )
    span = float(hi - lo)
    conf = F.round(
        (F.lit(1000000.0) * (F.col("_ss") - F.col("_n") * F.lit(int(lo))))
        / (F.col("_n") * F.lit(span))
    ).cast("long")
    acc = F.round(
        (F.lit(1000000.0) * F.col("_p")) / F.col("_n")
    ).cast("long")
    return agg.select(
        *group_cols,
        F.col("_b").alias("bin"),
        # FLOOR, not cast: Spark's double→long cast truncates while
        # DuckDB's rounds, so the oracle mirrors an explicit floor
        (F.lit(int(lo)) + F.floor(
            F.col("_b") * F.lit(float(hi - lo)) / F.lit(int(n_bins))
        )).cast("long").alias("bin_lo"),
        F.col("_n").alias("n"),
        F.col("_p").alias("n_pos"),
        conf.alias("conf_micro"),
        acc.alias("acc_micro"),
        F.abs(acc - conf).alias("gap_micro"),
    )


def calibration_error(
    df: DataFrame,
    score_col: str | Column,
    label_col: str | Column,
    n_bins: int = 10,
    lo: int = 0,
    hi: int = 1000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Expected calibration error per group: ECE = Σ_b (n_b/N)·gap_b
    over the :func:`calibration_bins` table — one scalar per group
    summarizing the reliability diagram (Naeini et al. 2015's binned
    ECE, the standard single-number calibration report).

    Exactness: gap_b is already exact integer micro (see
    calibration_bins), so Σ n_b·gap_b and N are exact int64 and the
    single final division is the module's one-rounding discipline.
    Returns (group_cols..., n, ece_micro). Same scale shape as the
    bins table it folds: the corpus pass is the bins aggregate; this
    adds one control-plane-sized re-aggregate."""
    bins = calibration_bins(
        df, score_col, label_col, n_bins=n_bins, lo=lo, hi=hi,
        group_cols=group_cols,
    )
    group_cols = group_cols or []
    out = bins.groupBy(*group_cols).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum(F.col("n") * F.col("gap_micro")).cast("long").alias("_wg"),
    )
    return out.select(
        *group_cols,
        "n",
        F.round(F.col("_wg") / F.col("n")).cast("long").alias("ece_micro"),
    )


def brier_score(
    df: DataFrame,
    score_col: str | Column,
    label_col: str | Column,
    lo: int = 0,
    hi: int = 1000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Brier score per group — the PROPER scoring rule that completes
    the calibration leg next to the binned diagnostics: ECE can be
    gamed by a constant base-rate predictor (perfectly calibrated,
    zero resolution), while the Brier score = mean (p − y)² decomposes
    into calibration − resolution + irreducible uncertainty (Murphy
    1973), so it penalizes exactly what ECE forgives. Reported with
    the reference Brier of the always-base-rate predictor
    (= ȳ·(1−ȳ), the uncertainty term) so a reader gets the skill
    comparison without a second query.

    Scores are integer units on [lo, hi] mapped to probabilities
    p = (s − lo)/(hi − lo), CLAMPED into [0, 1] (out-of-range scores
    saturate rather than produce p outside probability space —
    calibration_bins' edge-bin discipline). Exactness: with
    span = hi − lo, each residual span·p − span·y = clamp(s − lo) −
    span·y is exact int64, so Σ residual² is exact int64 (≤ n·span²;
    span 1000 holds exactness to ~9·10⁹ rows/group — quantize wider
    domains first, the module discipline) and ONE final division by
    n·span² yields micro units. The reference term's p·(n−p) numerator
    is exact int64 to n ≈ 6·10⁹ (≤ n²/4) and its n² denominator is
    computed in double (an int64 n·n would overflow at n ≈ 3·10⁹,
    inside the numerator's exact range). Returns (group..., n, brier_micro,
    base_rate_micro, brier_ref_micro).

    Scale shape: ONE (group) hash aggregate over codegen scalar
    arithmetic — map-side partials collapse to one row per group;
    NULL scores and labels drop up front (module policy)."""
    if hi <= lo:
        raise ValueError(f"brier_score: hi ({hi}) must exceed lo ({lo})")
    group_cols = group_cols or []
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    span = int(hi - lo)
    clamped = F.least(
        F.greatest(F.col("_s") - F.lit(int(lo)), F.lit(0)),
        F.lit(span),
    )
    resid = clamped - F.lit(span) * F.col("_y")
    agg = (
        df.select(
            *group_cols,
            score.cast("long").alias("_s"),
            label.cast("int").alias("_y"),
        )
        .filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(resid * resid).cast("long").alias("_sq"),
            F.sum("_y").cast("long").alias("_p"),
        )
    )
    denom = F.col("n") * F.lit(float(span) * span)
    # base rate and reference Brier ȳ(1−ȳ) from the same exact counts:
    # both get ONE double division each (micro-rounded outputs)
    return agg.select(
        *group_cols,
        "n",
        F.round(F.lit(1000000.0) * F.col("_sq") / denom)
        .cast("long").alias("brier_micro"),
        F.round(F.lit(1000000.0) * F.col("_p") / F.col("n"))
        .cast("long").alias("base_rate_micro"),
        F.round(
            F.lit(1000000.0)
            * (F.col("_p") * (F.col("n") - F.col("_p")))
            # n² must not fold in int64: a long denominator overflows at
            # n ≳ 3.0e9 rows/group, under the int64-exact bound the
            # numerator keeps (p·(n−p) ≤ n²/4, exact to n ≈ 6.1e9). The
            # double cast mirrors the oracle's CAST(n AS DOUBLE) * n.
            / (F.col("n").cast("double") * F.col("n"))
        ).cast("long").alias("brier_ref_micro"),
    )
