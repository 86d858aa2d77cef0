"""operators/diff.py — snapshot diff statuses on hand-built corpora."""

from __future__ import annotations

from data_wrangling_spark.operators.diff import (
    snapshot_diff,
    snapshot_diff_summary,
)


def test_all_four_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "gamma text"),
         (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta REVISED"), (4, None),
         (9, "brand new doc")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",  # NULL -> NULL fingerprints compare null-safe equal
        9: "added",
    }


def test_whitespace_and_case_edits_are_unchanged(spark):
    """Same normalization as exact dedup: whitespace kind/width and
    case do not count as changes."""
    old = spark.createDataFrame([(1, "Hello   World")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "hello\nworld")], "doc_id long, text string")
    assert snapshot_diff(old, new).collect()[0].status == "unchanged"


def test_text_to_null_is_changed(spark):
    old = spark.createDataFrame([(1, "some text")], "doc_id long, text string")
    new = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert snapshot_diff(old, new).collect()[0].status == "changed"


def test_summary_counts(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "doc_id long, text string"
    )
    got = {r.status: r.n_docs for r in snapshot_diff_summary(old, new).collect()}
    assert got == {"added": 1, "removed": 1, "changed": 1, "unchanged": 1}


def test_plan_is_one_join_no_window(spark):
    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    plan = (
        snapshot_diff(old, new)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FullOuter" in plan and (
        "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    )
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
