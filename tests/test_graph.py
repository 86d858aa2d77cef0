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
