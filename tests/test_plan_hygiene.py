"""Registry-wide physical-plan hygiene sweep — the scale-killer
checklist as a regression net, not a one-off audit.

Every registered query's executed plan at sf0.001 is scanned for (plan
construction only — except the EXECUTES_ON_BUILD set below, whose
DataFrame construction itself runs Spark jobs):
- CartesianProduct: never acceptable;
- BroadcastNestedLoopJoin: acceptable ONLY where it is a deliberate
  broadcast of a provably-tiny side (probe vectors, scalar counts, date
  spines) — whitelisted per query;
- BatchEvalPython (row-at-a-time Python UDFs): never acceptable; the
  only Python on any data path must be Arrow-batched
  (ArrowEvalPython / mapInPandas).

Streaming and iterative queries are excluded: building their DataFrame
executes jobs (stream drains, Pregel rounds), and their scale posture is
pinned by their own tests instead.
"""

from __future__ import annotations

import pytest

from data_wrangling_spark.plans.registry import QUERIES, queries

queries()  # force registration

SF_DIR = "/root/testdata/sf0.001"

#: building these executes work (stream drains / iterative rounds /
#: driver-side layout actions) — their shape is pinned in their own tests
EXECUTES_ON_BUILD = {n for n in QUERIES if n.startswith("x_stream_")} | {
    "x_graph_pagerank",
    "x_dedup_clusters",
    # leakage-safe split runs dedup_clusters' Pregel rounds at build
    "x_dataset_split_leakage_safe",
    # BucketedRandomProjectionLSH.fit runs real jobs when the DataFrame is
    # built; its BNLJ-cleanliness is noted in the CLEAN-plans comment below
    # and pinned by tests/test_similarity.py
    "x_sim_topk_mllib_brp",
    # the arrow matmul kernel collects its <=5 probe vectors at build
    # time (control-plane); the scoring plan itself is mapInPandas +
    # window — no join at all
    "x_sim_topk_bruteforce",
    # exact_quantiles boundary passes run eagerly at build time (tiny
    # control-plane histogram jobs); the returned plan is asserted by the
    # dedicated single-partition test below
    "ext_deciles_scalable",
    "ext_percentiles_scalable",
    # two-pass ranked NTILE: builds run the exact_quantiles cut-point
    # jobs + the bucket-counts job; funnel-freedom asserted by the
    # dedicated test below
    "ext_ntile_deciles",
    # two-pass distributed prefix sum: builds run the bounds agg + the
    # O(n_ranges) totals agg; plan shape pinned by the dedicated
    # test_sequence_pack_plan_is_distributed below
    "x_text_sequence_pack",
}

#: queries where a BroadcastNestedLoopJoin is the deliberate plan: a
#: broadcast side that is provably tiny (<=8 centroids, <=5 probe
#: vectors, a 1-row count/bounds aggregate, a generated date spine)
BNLJ_ALLOWED = {
    "x_sim_topk_bruteforce",   # expr kernel: 5 probe vectors broadcast
                               # (arrow kernel plans no join at all)
    "x_sim_topk_lsh",          # query band rows broadcast
    "x_sim_topk_ivf",          # 8 centroids broadcast
    "x_sketch_countmin_heavy_hitters",  # 1-row total-count broadcast
    "x_text_tfidf",            # 1-row corpus-count broadcast
    "ext_gapfill_daily",       # 1-row bounds agg + generated date spine
    "ext_tpch_q22_dormant_customers",  # 1-row balance-threshold agg broadcast
    "x_corpus_temperature_mixture",    # 1-row mixture-total broadcast
    "x_text_bm25_search",              # 1-row (N, avgdl) stats broadcast
    "ext_tpch_q11_important_parts",    # 1-row grand-total-value broadcast
    "ext_tpch_q15_top_supplier",       # 1-row max-revenue broadcast
    "x_text_lm_score",                 # 1-row vocabulary-size broadcast
    "x_text_collocations",             # 1-row (N, N_pairs) totals broadcast
    # x_text_dsir REMOVED round 11: the round-10 dsir refactor (8a22a19)
    # replaced the crossJoin(broadcast(totals)) with a global window over
    # the 1024-row bucket model, so the executed plan has no BNLJ and the
    # stale exemption would have masked a regression (round-10 ADVICE).
}
# notable CLEAN plans (verified no BNLJ despite the pattern suggesting
# one): ext_range_join_bucketed (bucket explode gives Catalyst an equi
# conjunct), x_dedup_embedding_cosine, x_text_decontaminate,
# x_sim_topk_mllib_brp

PLANNABLE = sorted(set(QUERIES) - EXECUTES_ON_BUILD)


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name in PLANNABLE:
        df = QUERIES[name].spark(spark, SF_DIR)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


@pytest.mark.parametrize("name", PLANNABLE)
def test_no_cartesian_product(plans, name):
    assert "CartesianProduct" not in plans[name], (
        f"{name} plans a cartesian product"
    )


@pytest.mark.parametrize("name", PLANNABLE)
def test_nested_loop_only_where_deliberate(plans, name):
    if name in BNLJ_ALLOWED:
        return
    assert "BroadcastNestedLoopJoin" not in plans[name], (
        f"{name} plans BroadcastNestedLoopJoin but is not whitelisted — "
        "either the join lost its equi conjunct (scale bug) or the "
        "broadcast side is deliberately tiny (add to BNLJ_ALLOWED with "
        "a justification)"
    )


@pytest.mark.parametrize("name", PLANNABLE)
def test_no_row_at_a_time_python(plans, name):
    assert "BatchEvalPython" not in plans[name], (
        f"{name} runs a row-at-a-time Python UDF — use built-in "
        "expressions or an Arrow-batched form"
    )


def test_scalable_deciles_have_no_single_partition_exchange(spark, plans):
    """ext_deciles_scalable exists BECAUSE NTILE funnels every row
    through one task; its own plan must not re-introduce that funnel.

    Round-3 regression this pins: the boundary pass used Spark's exact
    ``percentile`` aggregate, whose PARTIAL BUFFER holds every input
    value — so its final-merge Exchange SinglePartition shipped the
    whole column through one task. The rewrite computes boundaries with
    operators.quantiles.exact_quantiles (strata histogram refinement,
    constant-size aggregate buffers, O(strata) driver collects) and
    bands against literal cut points, so the returned plan has no
    single-partition exchange and no percentile aggregate at all."""
    df = QUERIES["ext_deciles_scalable"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, (
        "the scalable decile path planned a single-partition exchange"
    )
    assert "percentile" not in plan, (
        "exact percentile's partial buffer holds every value — use "
        "exact_quantiles for boundary computation"
    )

def test_ntile_deciles_have_no_single_partition_exchange(spark):
    """Round-4 'weak' item closed: ext_ntile_deciles itself (exact NTILE
    semantics via two-pass distributed ranking) must plan no
    single-partition exchange and no global-window NTILE."""
    df = QUERIES["ext_ntile_deciles"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, (
        "the ranked NTILE path planned a single-partition exchange"
    )
    assert "ntile" not in plan.lower(), (
        "a global NTILE window crept back into the registered query"
    )
    # round-5 review find: the earlier repartitionByRange form pinned a
    # persist for correctness (RangePartitioner re-samples per job; a
    # lost cache block would silently mis-offset ranks) and leaked the
    # cached relation. The deterministic cut-point bucketing needs no
    # cache — its absence in the plan is the regression pin.
    assert "InMemoryTableScan" not in plan, (
        "ext_ntile_deciles must not rely on a persisted relation: "
        "bucketing must be deterministic under recomputation"
    )


def test_bruteforce_arrow_plan_shape(spark):
    """x_sim_topk_bruteforce left PLANNABLE when its arrow kernel made
    it EXECUTES_ON_BUILD (probe collect), which silently dropped it
    from the generic hygiene sweep — this dedicated check restores the
    coverage (round-5 review find): the scoring plan must be Arrow
    mapInPandas + window, with no cartesian product and no row-at-a-time
    Python."""
    df = QUERIES["x_sim_topk_bruteforce"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, "arrow kernel should plan MapInPandas"
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan, "row-at-a-time Python crept in"


def test_naive_ntile_funnel_contrast(spark):
    """The naive unpartitioned-NTILE formulation — REMOVED from the
    registry in round 5 — preserved here as the documented contrast: a
    window with a global ORDER BY and no PARTITION BY must funnel every
    row through one task. If Spark ever learns to plan this without the
    funnel, this test tells us the two-pass rank is no longer needed."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    naive = orders.select(F.ntile(10).over(w).alias("decile"))
    plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" in plan


def test_scalable_grouped_percentiles_plan(spark):
    """ext_percentiles_scalable (also EXECUTES_ON_BUILD, so outside the
    generic sweep): the banding pass must broadcast the tiny boundary
    table on the group key (equi join), never a nested loop, and no
    percentile aggregate or single-partition exchange may appear."""
    df = QUERIES["ext_percentiles_scalable"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "percentile" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunk_overlap_plans_no_exchange(spark):
    """x_text_chunk_overlap is documented as shuffle-free: split →
    sequence → posexplode → slice is narrow end-to-end, and the
    registered form deliberately omits a cosmetic ORDER BY (the driver
    compare is order-insensitive) so the plan carries ZERO exchanges."""
    df = QUERIES["x_text_chunk_overlap"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "chunking planned a shuffle"


def test_vec_normalize_computes_norm_once(spark):
    """Round-5 review find: CollapseProject inlines a SINGLE-use
    non-cheap alias back into a consuming higher-order lambda, so a
    pre-projection alone does NOT stop the O(d) norm aggregate from
    re-running per element (O(d^2) per vector). The registered query
    references `_n` twice (norm output column + the division), which
    provably survives collapse: the optimized plan must contain exactly
    ONE `aggregate(` — in the projection — and none inside the
    transform lambda."""
    df = QUERIES["x_vec_normalize"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_aggs = plan.count("aggregate(")
    assert n_aggs == 1, (
        f"expected the norm aggregate exactly once in the optimized plan, "
        f"found {n_aggs} — the pre-projection collapsed back into the "
        "per-element lambda (O(d^2) per vector)"
    )


# ------------------------------------------------------------------
# unpartitioned data-sized windows (round-7 verdict, What's wrong #1)
# ------------------------------------------------------------------

def _window_nodes(plan: str) -> list[list[str]]:
    """Parse every ``Window [...]`` node in a physical-plan string into
    its top-level bracket groups (depth-tracked — window expressions may
    nest brackets). A partitioned+ordered WindowExec prints THREE groups
    ``[exprs], [partitionSpec], [orderSpec]``; with only two groups the
    second is EITHER a partition spec (unordered frame, e.g. q21's
    collect_set over l_orderkey — fine) or an order spec (global ORDER
    BY window — the Exchange SinglePartition funnel); order specs are
    recognizable by their ASC/DESC direction tokens."""
    nodes = []
    for line in plan.splitlines():
        stripped = line.lstrip(" +:-|")
        if not stripped.startswith("Window "):
            continue
        groups, depth, cur = [], 0, []
        for ch in stripped[len("Window "):]:
            if ch == "[":
                depth += 1
                if depth == 1:
                    cur = []
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(cur))
                    continue
            if depth >= 1:
                cur.append(ch)
        nodes.append(groups)
    return nodes


#: queries whose UNPARTITIONED window is deliberate — the window input
#: is control-plane-sized by construction, so the single task it runs
#: in sees O(small) rows no matter the data scale
UNPARTITIONED_WINDOW_ALLOWED = {
    # global lag over the post-aggregate funnel table: O(steps)=3 rows
    # (operators/temporal.py funnel_steps)
    "ext_funnel_steps",
    # final presentation rank AFTER .limit(top): O(k) rows
    # (operators/text_analysis.py bm25_search)
    "x_text_bm25_search",
    # event-type x event-type transition matrix: O(types^2) rows
    # (plans/scale_queries.py markov transitions)
    "x_event_transition_matrix",
    # smoothing totals as a global window over the POST-AGGREGATE
    # bucket-model table: O(n_buckets)=1024 rows by construction — the
    # crossJoin(broadcast(totals)) alternative re-executed the token
    # explode as a third corpus pass (operators/text_analysis.py
    # dsir_importance, round-10 probe)
    "x_text_dsir",
}


@pytest.mark.parametrize("name", PLANNABLE)
def test_no_unpartitioned_data_sized_windows(plans, name):
    """x_text_sequence_pack's global-ORDER-BY cumsum was the round-7
    verdict's last scale-killer: a window with an order spec but no
    partition spec serializes its whole input through ONE task. Fixed
    via operators/prefix.py; this sweep bans the shape registry-wide so
    it cannot creep back. Whitelisted queries window over provably
    control-plane row counts (see each justification above)."""
    def _unpartitioned(groups: list[str]) -> bool:
        if len(groups) >= 3:
            return False
        if len(groups) == 1:  # no partition, no order: global frame
            return True
        last = groups[-1]
        return " ASC" in last or " DESC" in last  # order spec, no partition

    bad = [g for g in _window_nodes(plans[name]) if _unpartitioned(g)]
    if name in UNPARTITIONED_WINDOW_ALLOWED:
        return
    assert not bad, (
        f"{name} plans an UNPARTITIONED window {bad} — a data-sized "
        "input serializes through one task. Use a partitioned window, "
        "operators/prefix.py's two-pass prefix sum, or whitelist with a "
        "control-plane justification"
    )


#: bounded-domain columns of the test tables (and their common aliases
#: in plans): a window PARTITIONED solely by these caps parallelism at
#: the domain size (~5-150 tasks) at ANY cluster scale — if its input
#: is data-sized, the whole corpus funnels through those few tasks.
#: Detected from partition specs after stripping expr-id suffixes.
LOW_CARDINALITY_COLUMNS = {
    # synthetic tables
    "source", "lang", "event_type", "label",
    # TPC-H bounded domains
    "l_returnflag", "l_linestatus", "l_shipmode", "o_orderstatus",
    "o_orderpriority", "c_mktsegment", "p_brand", "p_container",
    "p_type", "n_name", "r_name", "n_nationkey", "r_regionkey",
    "nation", "region", "cust_nation", "supp_nation",
}

#: queries whose low-cardinality-partitioned window is deliberate
#: because the WINDOW INPUT is provably bounded (not the corpus):
LOWCARD_WINDOW_ALLOWED = {
    # cumulative window over the per-source DISTINCT-score table — the
    # input is score-domain bounded (integer-milli quantization) by the
    # roc_auc design, never row-bounded (operators/evaluation.py)
    "x_eval_auc_quality",
}


def _lowcard_partition(groups: list[str]) -> list[str] | None:
    """Partition columns of a Window node if they are ALL known
    bounded-domain columns, else None. Expr-id suffixes (#123L) and
    simple qualifiers are stripped before matching."""
    import re

    if len(groups) >= 3:
        spec = groups[1]
    elif len(groups) == 2 and not (
        " ASC" in groups[-1] or " DESC" in groups[-1]
    ):
        spec = groups[1]  # unordered frame: [exprs], [partition]
    else:
        return None  # unpartitioned — the sweep above owns that shape
    cols = [re.sub(r"#\d+L?", "", t.strip()) for t in spec.split(",")]
    return cols if cols and all(c in LOW_CARDINALITY_COLUMNS for c in cols) else None


@pytest.mark.parametrize("name", PLANNABLE)
def test_no_lowcard_partition_data_sized_windows(plans, name):
    """Round-12 verdict, What's wrong #1: x_corpus_source_cap funneled
    the whole corpus through a window partitioned by the ~20-value
    source key — parallelism capped at n_sources tasks at any cluster
    size — and the unpartitioned-only sweep above could not see it.
    This sweep flags every Window partitioned solely by bounded-domain
    columns unless (a) the plan carries a WindowGroupLimit, i.e. Spark
    bounds the rows reaching the window to rank<=k per group per input
    partition (ext_topn_per_group, the reworked source_cap), or (b) the
    query justifies a bounded window INPUT in LOWCARD_WINDOW_ALLOWED."""
    bad = [
        cols
        for g in _window_nodes(plans[name])
        if (cols := _lowcard_partition(g)) is not None
    ]
    if not bad or name in LOWCARD_WINDOW_ALLOWED:
        return
    assert "WindowGroupLimit" in plans[name], (
        f"{name} plans a window partitioned only by bounded-domain "
        f"column(s) {bad} with no WindowGroupLimit — a data-sized input "
        "funnels through <= domain-size tasks at any cluster scale. "
        "Restructure (rank<=k filter branch + plain aggregate, as in "
        "operators/splits.py source_cap), or whitelist with a bounded-"
        "input justification"
    )


def test_lowcard_window_sweep_catches_prefix_source_cap_shape(spark):
    """The detector must flag the PRE-round-13 source_cap shape (whole
    corpus through one window over `source`, rank consumed by both <=cap
    and >cap predicates so WindowGroupLimit cannot fire) — the exact
    plan that shipped with a 17.8x ratio at 100x."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    old_shape = (
        docs.select(
            "source", "n_chars", F.row_number().over(w).alias("_rnk")
        )
        .select(
            "source",
            (F.col("_rnk") <= 10).alias("_top"),
            (F.col("_rnk") > 10).alias("_tail"),
        )
        .groupBy("source")
        .agg(
            F.sum(F.col("_top").cast("long")).alias("n_top"),
            F.sum(F.col("_tail").cast("long")).alias("n_tail"),
        )
    )
    plan = old_shape._jdf.queryExecution().executedPlan().toString()
    flagged = [
        cols
        for g in _window_nodes(plan)
        if (cols := _lowcard_partition(g)) is not None
    ]
    assert flagged == [["source"]], f"detector missed the shape: {flagged}"
    assert "WindowGroupLimit" not in plan, (
        "the pre-fix shape unexpectedly planned a WindowGroupLimit — "
        "the regression test no longer reproduces the defect"
    )


def test_source_cap_plan_has_window_group_limit(spark):
    """Round-13 rework acceptance (verdict item 1): the registered
    x_corpus_source_cap plan must carry a WindowGroupLimit (partial
    top-k before the exchange) and exactly one Window node — over the
    rank<=cap-bounded branch, never the corpus."""
    df = QUERIES["x_corpus_source_cap"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert len(_window_nodes(plan)) == 1


def test_sequence_pack_plan_is_distributed(spark):
    """The fixed x_text_sequence_pack (EXECUTES_ON_BUILD: two tiny
    control aggregates run at plan construction) must plan its cumsum
    window PARTITIONED by the id-range bucket with a hash exchange —
    never Exchange SinglePartition, never an unpartitioned window."""
    df = QUERIES["x_text_sequence_pack"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, (
        "sequence packing re-introduced the single-partition funnel"
    )
    windows = _window_nodes(plan)
    assert windows, "expected the per-range cumulative window"
    assert all(len(g) == 3 for g in windows), (
        f"cumsum window lost its partition spec: {windows}"
    )
