"""operators/evaluation.py — exact ROC-AUC (Mann-Whitney midrank) and
precision/recall sweeps against hand-computed and sklearn-free
closed-form ground truths."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangling_spark.operators.evaluation import pr_at_thresholds, roc_auc


def _auc_rows(spark, rows):
    df = spark.createDataFrame(rows, "s long, y int")
    out = roc_auc(df, "s", "y").collect()
    assert len(out) == 1
    return out[0]


def test_auc_perfect_separation(spark):
    r = _auc_rows(spark, [(1, 0), (2, 0), (3, 1), (4, 1)])
    assert (r.n_pos, r.n_neg, r.auc_micro) == (2, 2, 1000000)


def test_auc_perfect_inversion(spark):
    r = _auc_rows(spark, [(5, 1), (6, 1), (7, 0), (8, 0)])
    assert r.auc_micro == 0


def test_auc_random_interleave(spark):
    # pairs (pos above neg): (3>1),(3>2) yes... enumerate:
    # negs {1, 3}, poss {2, 4}: pairs 2>1 yes, 2>3 no, 4>1 yes, 4>3 yes
    # AUC = 3/4
    r = _auc_rows(spark, [(1, 0), (2, 1), (3, 0), (4, 1)])
    assert r.auc_micro == 750000


def test_auc_ties_use_midrank(spark):
    # one pos and one neg share score 5: the tied pair contributes 1/2
    # (trapezoid over the tie block). negs {1, 5}, poss {5, 9}:
    # 5>1 = 1, 5=5 = 0.5, 9>1 = 1, 9>5 = 1 -> AUC = 3.5/4 = 0.875
    r = _auc_rows(spark, [(1, 0), (5, 0), (5, 1), (9, 1)])
    assert r.auc_micro == 875000


def test_auc_single_class_groups_dropped(spark):
    df = spark.createDataFrame(
        [("a", 1, 0), ("a", 2, 1), ("b", 3, 1), ("b", 4, 1)],
        "g string, s long, y int",
    )
    out = {r.g: r for r in roc_auc(df, "s", "y", ["g"]).collect()}
    assert set(out) == {"a"}  # b has no negatives: AUC undefined
    assert out["a"].auc_micro == 1000000


def test_auc_boolean_label_column(spark):
    df = spark.createDataFrame([(1, False), (2, True)], "s long, y boolean")
    assert roc_auc(df, "s", "y").collect()[0].auc_micro == 1000000


def test_pr_sweep_known_values(spark):
    # scores 1..4, positives at 3 and 4; threshold 3 -> pred {3,4},
    # tp=2, P=2: precision 1.0, recall 1.0, f1 1.0; threshold 2 ->
    # pred {2,3,4}, tp=2: precision 2/3
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "s long, y int"
    )
    out = {
        r.threshold: r
        for r in pr_at_thresholds(df, "s", "y", [2, 3, 5]).collect()
    }
    assert out[3].n_pred_pos == 2 and out[3].tp == 2
    assert out[3].precision_micro == 1000000
    assert out[3].recall_micro == 1000000
    assert out[3].f1_micro == 1000000
    assert out[2].precision_micro == 666667  # round(2/3 * 1e6)
    # aggressive threshold: nothing predicted positive -> NULL precision,
    # recall 0, f1 defined (denominator P=2)
    assert out[5].n_pred_pos == 0 and out[5].precision_micro is None
    assert out[5].recall_micro == 0 and out[5].f1_micro == 0


def test_auc_matches_bruteforce_pair_count(spark):
    """Property check: on a deterministic pseudo-random set, the
    windowed AUC equals the O(P*N) pair definition computed driver-side."""
    rows = [((i * 37) % 101, 1 if (i * 53) % 7 < 3 else 0) for i in range(200)]
    df = spark.createDataFrame(rows, "s long, y int")
    got = roc_auc(df, "s", "y").collect()[0]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    num = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    want = round(1e6 * (2 * num) / (2.0 * len(pos) * len(neg)))
    assert got.auc_micro == want


def test_auc_plan_shape(spark):
    """The scale contract: even UNGROUPED, the cumulative-negatives
    window must be PARTITIONED (prefix_sum's id-range buckets), never a
    global ORDER BY funnel. The one Exchange SinglePartition allowed is
    the final 1-row global aggregate (reduces O(ranges) partial rows —
    the standard global-agg shape), so the assertion targets the Window
    nodes, not the whole plan."""
    from tests.test_plan_hygiene import _window_nodes

    df = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("s"), (F.col("id") % 2).cast("int").alias("y")
    )
    plan = roc_auc(df, "s", "y")._jdf.queryExecution().executedPlan().toString()
    windows = _window_nodes(plan)
    assert windows, "expected the per-range cumulative window"
    assert all(len(g) == 3 for g in windows), (
        f"cumulative window lost its partition spec: {windows}"
    )


def test_auc_ungrouped_negative_scores(spark):
    """The ungrouped path routes through prefix_sum's id-range buckets:
    negative score domains must bucket and splice correctly (milli
    scores are signed in the registered queries)."""
    rows = [(-800, 0), (-200, 0), (-100, 1), (300, 1)]
    df = spark.createDataFrame(rows, "s long, y int")
    assert roc_auc(df, "s", "y").collect()[0].auc_micro == 1000000


def test_auc_null_scores_dropped_consistently(spark):
    """Round-8 advisor find: the grouped path used to rank NULL scores
    NULLS FIRST while the ungrouped path crashed in prefix_sum. Both
    now drop NULL-score rows up front, so grouped and ungrouped agree
    and equal the result on the pre-filtered input."""
    rows = [(1, 0), (2, 1), (3, 0), (4, 1), (None, 1), (None, 0)]
    df = spark.createDataFrame(rows, "s long, y int")
    clean = df.filter(F.col("s").isNotNull())
    want = roc_auc(clean, "s", "y").collect()[0]
    ungrouped = roc_auc(df, "s", "y").collect()[0]
    grouped = roc_auc(
        df.withColumn("g", F.lit("a")), "s", "y", ["g"]
    ).collect()[0]
    assert ungrouped.auc_micro == want.auc_micro
    assert grouped.auc_micro == want.auc_micro
    assert ungrouped.n_pos == want.n_pos == grouped.n_pos


def test_auc_num2_decimal_no_int64_wrap(spark):
    """Round-8 advisor find: num2 = SUM(p*(2*nb+n)) ~ 2*P*N wraps int64
    at ~4.6e18 pairs under non-ANSI long arithmetic. The accumulator is
    now decimal(38,0); simulate the regime with pre-aggregated counts
    fed through the same internal arithmetic by using huge per-score
    counts via a weighted input (each distinct score row repeated as a
    count through grouping is infeasible at test scale, so verify the
    plan type instead + a large-count smoke via the public API)."""
    # plan-level check: the _num2 sum aggregates a decimal, not a long
    df = spark.createDataFrame([(1, 0), (2, 1)], "s long, y int")
    plan = roc_auc(df, "s", "y")._jdf.queryExecution().analyzed().toString()
    assert "decimal(38,0)" in plan, plan


def test_pr_sweep_duplicate_thresholds_not_double_counted(spark):
    """Round-8 advisor find: duplicate thresholds exploded duplicate
    rows that collapsed into one (group, threshold) group, doubling
    n_pred_pos / tp / denominators. Thresholds are now deduplicated."""
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "s long, y int"
    )
    out = {
        r.threshold: r
        for r in pr_at_thresholds(df, "s", "y", [3, 3, 3, 2]).collect()
    }
    assert out[3].n_pred_pos == 2 and out[3].tp == 2
    assert out[3].precision_micro == 1000000
    assert out[2].n_pred_pos == 3


def test_pr_sweep_null_scores_dropped_like_roc_auc(spark):
    """Round-9 advisor find: pr_at_thresholds kept NULL-score rows —
    NULL >= t never counted in n_pred_pos/tp, yet their positives
    counted in the recall denominator, silently deflating recall/F1 at
    every threshold. NULL scores are now dropped up front, matching
    roc_auc's round-8 policy."""
    rows = [(1, 0), (2, 1), (3, 0), (4, 1), (None, 1), (None, 1)]
    df = spark.createDataFrame(rows, "s long, y int")
    clean = df.filter(F.col("s").isNotNull())
    want = {r.threshold: r for r in pr_at_thresholds(clean, "s", "y", [2]).collect()}
    got = {r.threshold: r for r in pr_at_thresholds(df, "s", "y", [2]).collect()}
    # recall = tp / P over NON-NULL-score positives only: 2/2, not 2/4
    assert got[2].recall_micro == want[2].recall_micro == 1000000
    assert got[2].f1_micro == want[2].f1_micro
    assert got[2].n_pred_pos == 3 and got[2].tp == 2


# ---------------------------------------------------------------------------
# calibration_bins / calibration_error (round 10)
# ---------------------------------------------------------------------------

def test_calibration_bins_hand_computed(spark):
    from data_wrangling_spark.operators.evaluation import calibration_bins

    # 4 bins over [0, 400): width 100. scores 50,150,150,250 ->
    # bins 0,1,1,2; labels 0,1,0,1
    df = spark.createDataFrame(
        [(50, 0), (150, 1), (150, 0), (250, 1)], "s long, y int"
    )
    out = {r.bin: r for r in calibration_bins(
        df, "s", "y", n_bins=4, lo=0, hi=400).collect()}
    assert set(out) == {0, 1, 2}
    b0, b1, b2 = out[0], out[1], out[2]
    assert (b0.n, b0.n_pos, b0.bin_lo) == (1, 0, 0)
    # conf = 1e6 * 50/400 = 125000; acc = 0
    assert (b0.conf_micro, b0.acc_micro, b0.gap_micro) == (125000, 0, 125000)
    assert (b1.n, b1.n_pos, b1.bin_lo) == (2, 1, 100)
    # conf = 1e6 * 300/(2*400) = 375000; acc = 500000
    assert (b1.conf_micro, b1.acc_micro, b1.gap_micro) == (
        375000, 500000, 125000)
    assert (b2.n, b2.n_pos, b2.bin_lo) == (1, 1, 200)
    assert (b2.conf_micro, b2.acc_micro) == (625000, 1000000)


def test_calibration_bins_clamps_out_of_range(spark):
    from data_wrangling_spark.operators.evaluation import calibration_bins

    # -50 clamps into bin 0, 1000 clamps into the top bin
    df = spark.createDataFrame([(-50, 0), (1000, 1)], "s long, y int")
    out = {r.bin: r for r in calibration_bins(
        df, "s", "y", n_bins=4, lo=0, hi=400).collect()}
    assert set(out) == {0, 3}
    assert out[0].n == 1 and out[3].n == 1
    # clamped conf can leave [0, 1e6]: -50/400 and 1000/400
    assert out[0].conf_micro == -125000
    assert out[3].conf_micro == 2500000


def test_calibration_bins_null_scores_dropped(spark):
    from data_wrangling_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame(
        [(None, 1), (150, 1)], "s long, y int"
    )
    out = calibration_bins(df, "s", "y", n_bins=4, lo=0, hi=400).collect()
    assert len(out) == 1 and out[0].n == 1


def test_calibration_bins_null_labels_dropped(spark):
    """Round-10 advisor find: a NULL label counted in n (F.count) but
    not n_pos (F.sum skips NULLs), silently deflating acc_micro. NULL
    labels are now dropped alongside NULL scores."""
    from data_wrangling_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame(
        [(150, None), (150, 1), (150, 1)], "s long, y int"
    )
    out = calibration_bins(df, "s", "y", n_bins=4, lo=0, hi=400).collect()
    assert len(out) == 1
    # without the drop: n=3, acc=666667; with it: n=2, acc=1000000
    assert out[0].n == 2 and out[0].n_pos == 2
    assert out[0].acc_micro == 1000000


def test_pr_sweep_null_labels_dropped(spark):
    """Same policy extended to pr_at_thresholds (round 11): a NULL
    label inflated n_pred_pos via the count while tp skipped it,
    deflating precision."""
    from data_wrangling_spark.operators.evaluation import pr_at_thresholds

    df = spark.createDataFrame(
        [(500, None), (500, 1)], "s long, y int"
    )
    out = pr_at_thresholds(df, "s", "y", thresholds=[0]).collect()
    assert len(out) == 1
    assert out[0].n_pred_pos == 1 and out[0].tp == 1


def test_brier_score_hand_computed(spark):
    """p = clamp(s, 0, 1000)/1000 against y: residuals in milli are
    exact ints; brier = Σ(clamp(s)−1000y)² / (n·10⁶) in micro."""
    from data_wrangling_spark.operators.evaluation import brier_score

    df = spark.createDataFrame(
        # (score, y): p=0.9 vs 1 -> 0.01; p=0.2 vs 0 -> 0.04;
        # p=1.0 vs 0 -> 1.0; p=0.5 vs 1 -> 0.25
        [(900, 1), (200, 0), (1000, 0), (500, 1)], "s long, y int"
    )
    out = brier_score(df, "s", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 4
    assert r.brier_micro == round(1e6 * (0.01 + 0.04 + 1.0 + 0.25) / 4)
    assert r.base_rate_micro == 500000           # 2/4
    assert r.brier_ref_micro == 250000           # 0.5 * 0.5


def test_brier_score_clamps_and_drops_nulls(spark):
    from data_wrangling_spark.operators.evaluation import brier_score

    df = spark.createDataFrame(
        # -300 clamps to p=0, 1400 clamps to p=1; NULL rows drop
        [(-300, 0), (1400, 1), (None, 1), (500, None)],
        "s long, y int",
    )
    out = brier_score(df, "s", "y").collect()
    assert len(out) == 1
    assert out[0].n == 2 and out[0].brier_micro == 0


def test_brier_grouped_constant_predictor_vs_ref(spark):
    """The skill framing: a constant base-rate predictor's Brier equals
    the reference ȳ(1−ȳ) exactly — ECE would read 0 (calibrated) but
    Brier shows zero skill vs the reference."""
    from data_wrangling_spark.operators.evaluation import brier_score

    rows = [("a", 250, 1)] * 1 + [("a", 250, 0)] * 3
    df = spark.createDataFrame(rows, "g string, s long, y int")
    r = brier_score(df, "s", "y", group_cols=["g"]).collect()[0]
    # ȳ = 0.25, constant p = 0.25: brier = ȳ(1−ȳ) = 0.1875
    assert r.brier_micro == r.brier_ref_micro == 187500


def test_brier_validates_range(spark):
    import pytest as _pytest

    from data_wrangling_spark.operators.evaluation import brier_score

    df = spark.createDataFrame([(1, 1)], "s long, y int")
    with _pytest.raises(ValueError):
        brier_score(df, "s", "y", lo=5, hi=5)


def test_calibration_bins_validates_range(spark):
    import pytest as _pytest

    from data_wrangling_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame([(1, 1)], "s long, y int")
    with _pytest.raises(ValueError):
        calibration_bins(df, "s", "y", lo=10, hi=10)
    with _pytest.raises(ValueError):
        calibration_bins(df, "s", "y", n_bins=0)


def test_calibration_error_weighted_fold(spark):
    from data_wrangling_spark.operators.evaluation import calibration_error

    # same data as the hand-computed bins test: gaps 125000 (n=1),
    # 125000 (n=2), |625000-1000000|=375000 (n=1)
    # ECE = (1*125000 + 2*125000 + 1*375000) / 4 = 187500
    df = spark.createDataFrame(
        [(50, 0), (150, 1), (150, 0), (250, 1)], "s long, y int"
    )
    out = calibration_error(df, "s", "y", n_bins=4, lo=0, hi=400).collect()
    assert len(out) == 1
    assert (out[0].n, out[0].ece_micro) == (4, 187500)


def test_calibration_bins_grouped_single_aggregate_plan(spark):
    from data_wrangling_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame(
        [("a", 50, 0), ("a", 150, 1), ("b", 250, 1)], "g string, s long, y int"
    )
    out = calibration_bins(df, "s", "y", n_bins=4, lo=0, hi=400,
                           group_cols=["g"])
    rows = {(r.g, r.bin) for r in out.collect()}
    assert rows == {("a", 0), ("a", 1), ("b", 2)}
    # ONE corpus-pass aggregate: exactly one hash-aggregate pair
    # (partial + final) in the physical plan, no window, no join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "SortMergeJoin" not in plan and "Window" not in plan
