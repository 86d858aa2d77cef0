"""Connected components vs a pure-Python union-find reference on
adversarial graphs: chains (worst-case diameter), cycles, disjoint
cliques, and the end-to-end dedup pair→cluster path."""

from __future__ import annotations

from data_wrangling_spark.operators.graph import connected_components, dedup_clusters


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id component per node
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    want = _union_find(edges)
    # same membership AND same canonical (min) representative
    assert got == want, f"mismatch: {got} != {want}"


def test_chain_worst_case_diameter(spark):
    _check(spark, [(i, i + 1) for i in range(12)])


def test_cycle_and_disjoint_cliques(spark):
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    clique = [(a, b) for a in (10, 11, 12) for b in (10, 11, 12) if a < b]
    pair = [(100, 200)]
    _check(spark, cyc + clique + pair)


def test_reversed_and_duplicate_edges(spark):
    _check(spark, [(5, 3), (3, 5), (3, 1), (7, 7), (2, 1), (5, 3)])


def test_dedup_clusters_canonical_representative(spark):
    pairs = spark.createDataFrame(
        [(4, 9), (9, 17), (30, 31)], "doc_a long, doc_b long"
    )
    out = {r.id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert out == {4: 4, 9: 4, 17: 4, 30: 30, 31: 30}


def test_string_ids_not_nulled(spark):
    """Non-numeric ids (URL/hash doc ids) must keep their values — the
    component is the lexicographic min id."""
    df = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-c", "doc-b"), ("zzz", "yyy")],
        "src string, dst string",
    )
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == {
        "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
        "yyy": "yyy", "zzz": "yyy",
    }


def test_nonconvergence_raises(spark):
    """A partial propagation must raise, not silently split components."""
    import pytest

    chain = spark.createDataFrame([(i, i + 1) for i in range(8)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)
    # and with enough rounds the same graph succeeds
    out = connected_components(chain, max_iter=10).collect()
    assert all(r.component == 0 for r in out)


def _reference_pagerank(edges, damping=0.85, n_iter=15):
    """Independent dense power iteration with the same dangling policy
    (uniform redistribution), for cross-checking the DataFrame form."""
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    rank = [1.0 / n] * n
    for _ in range(n_iter):
        flowed = [0.0] * n
        for s, ds in out.items():
            share = rank[idx[s]] / len(ds)
            for d in ds:
                flowed[idx[d]] += share
        total_flowed = sum(flowed)
        dangling = 1.0 - total_flowed
        rank = [
            (1 - damping) / n + damping * (f + dangling / n) for f in flowed
        ]
    return {nodes[i]: rank[i] for i in range(n)}


def test_pagerank_two_node_cycle(spark):
    from data_wrangling_spark.operators.graph import pagerank

    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    got = {r.id: r.rank for r in pagerank(e).collect()}
    assert abs(got["a"] - 0.5) < 1e-9 and abs(got["b"] - 0.5) < 1e-9


def test_pagerank_matches_reference_with_dangling(spark):
    from data_wrangling_spark.operators.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (4, 2), (5, 0), (3, 0), (2, 6)]
    # node 6 is dangling (no out-edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(e).collect()}
    want = _reference_pagerank(edges)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # no mass leaks


def test_pagerank_hub_ranks_highest(spark):
    from data_wrangling_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [(i, 99) for i in range(10)] + [(99, 0)], "src long, dst long"
    )
    got = {r.id: r.rank for r in pagerank(e).collect()}
    assert got[99] == max(got.values())


def test_pagerank_empty_edges(spark):
    from data_wrangling_spark.operators.graph import pagerank

    e = spark.createDataFrame([], "src long, dst long")
    out = pagerank(e)
    assert out.columns == ["id", "rank"] and out.count() == 0
