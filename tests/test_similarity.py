"""Recall tests for the approximate similarity search vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangling_spark.operators.similarity import topk_bruteforce, topk_ivf, topk_lsh
from data_wrangling_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_bruteforce_topk_shape(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    out = topk_bruteforce(emb, q, k=5).collect()
    assert len(out) == 15  # 3 queries × 5 neighbors
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        ranks = sorted(r.rank for r in rows)
        assert ranks == [1, 2, 3, 4, 5]
        scores = [r.score for r in sorted(rows, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)
        assert all(r.neighbor_id != r.query_id for r in rows)


def test_lsh_topk_recall(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    brute = topk_bruteforce(emb, q, k=5).collect()
    approx = topk_lsh(emb, q, k=5, planes=12, bands=4).collect()
    brute_set = {(r.query_id, r.neighbor_id) for r in brute}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(brute_set & approx_set) / len(brute_set)
    # embeddings are clustered (FIXTURES.md) → same-cluster vectors share
    # hyperplane buckets; recall well above chance expected
    assert recall >= 0.5, f"LSH top-k recall {recall:.2f}"


def test_mllib_brp_cross_check(spark):
    """Independent-implementation cross-check: MLlib's
    BucketedRandomProjectionLSH (Euclidean p-stable hashing) must agree
    with our cosine brute force on this unit-norm corpus (d² = 2-2cos ⇒
    identical rankings), within LSH recall tolerance — catching any
    systematic bias shared by our hand-rolled hyperplane LSH and its
    recall test."""
    from data_wrangling_spark.operators.similarity import topk_mllib_brp

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    brute = topk_bruteforce(emb, q, k=5).collect()
    approx = topk_mllib_brp(emb, q, k=5).collect()
    brute_set = {(r.query_id, r.neighbor_id) for r in brute}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(brute_set & approx_set) / len(brute_set)
    assert recall >= 0.5, f"MLlib BRP recall {recall:.2f}"
    # where both found the pair, the distance must be consistent with
    # the cosine score: d = sqrt(2 - 2*cos) on unit vectors
    cos_by_pair = {(r.query_id, r.neighbor_id): r.score for r in brute}
    for r in approx:
        key = (r.query_id, r.neighbor_id)
        if key in cos_by_pair:
            want = (2 - 2 * cos_by_pair[key]) ** 0.5
            assert abs(r.distance - want) < 1e-4, (key, r.distance, want)


def test_ivf_lloyd_centroids_beat_raw_sample(spark):
    """Round-2 verdict item 5: Lloyd iterations must IMPROVE recall over
    the raw hash-sampled seed, pinned on a corpus with actual cluster
    structure (the sf embeddings table is near-uniform on the sphere —
    checked: brute top-5 neighbors share the generator label only ~8% of
    the time — so no centroid choice can beat the scanned fraction
    there). 10 deterministic well-separated clusters, nprobe=1: the raw
    sample sometimes seeds two centroids in one cluster and splits it;
    3 Lloyd rounds re-center and recover it."""
    import hashlib

    def prand(*key) -> float:
        h = int.from_bytes(
            hashlib.md5(":".join(map(str, key)).encode()).digest()[:4], "big"
        )
        return h / 2**32 - 0.5

    dim, n_clusters, per = 16, 10, 40
    rows = []
    for c in range(n_clusters):
        center = [4.0 * prand("c", c, d) for d in range(dim)]
        for i in range(per):
            rows.append(
                (c * per + i,
                 [center[d] + 0.3 * prand("p", c, i, d) for d in range(dim)])
            )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") % per < 2)  # 2 queries per cluster

    brute = {(r.query_id, r.neighbor_id) for r in topk_bruteforce(df, q, k=5).collect()}

    def recall(iters: int) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in topk_ivf(
                df, q, k=5, n_cells=10, nprobe=1, kmeans_iters=iters
            ).collect()
        }
        return len(got & brute) / len(brute)

    r_sample, r_lloyd = recall(0), recall(3)
    assert r_lloyd >= 0.85, f"Lloyd-IVF recall {r_lloyd:.2f}"
    assert r_lloyd >= r_sample + 0.05, (
        f"Lloyd must beat the raw sample: {r_lloyd:.2f} vs {r_sample:.2f}"
    )


def test_ivf_topk_recall(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    brute = topk_bruteforce(emb, q, k=5).collect()
    approx = topk_ivf(emb, q, k=5, n_cells=8, nprobe=3).collect()
    brute_set = {(r.query_id, r.neighbor_id) for r in brute}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(brute_set & approx_set) / len(brute_set)
    # clustered corpus (FIXTURES.md): same-cluster vectors land in the
    # same Voronoi cell, so probing 3/8 cells keeps most true neighbors
    assert recall >= 0.5, f"IVF top-k recall {recall:.2f}"
    # every query returns at most k ranked rows with valid ranks
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_bruteforce_kernels_equivalent_rounded(spark):
    """arrow (numpy matmul) and expr (zip_with/aggregate) kernels return
    row-identical results when scores are rounded before ranking — the
    contract that lets the registered oracle query use the fast kernel.
    Includes a zero-norm vector: both kernels must score it NULL (NaN
    would sort FIRST under desc and silently win every ranking)."""
    rows = [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)])
            for i in range(40)]
    rows.append((99, [0.0] * 8))  # zero-norm corpus vector
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    a = canon(topk_bruteforce(emb, q, k=5, round_to=6, kernel="arrow"))
    e = canon(topk_bruteforce(emb, q, k=5, round_to=6, kernel="expr"))
    assert a == e

    # the zero vector never outranks real neighbors in either kernel
    for rowset in (a, e):
        assert all(r[1] != 99 for r in rowset)

    import pytest

    with pytest.raises(ValueError, match="kernel"):
        topk_bruteforce(emb, q, k=5, kernel="blas")
    with pytest.raises(ValueError, match="empty query set"):
        topk_bruteforce(emb, emb.filter(F.col("vec_id") < 0), k=5)


def test_embedding_outliers_planted_outlier_wins(spark):
    from data_wrangling_spark.operators.similarity import embedding_outliers

    # 9 vectors near the origin + one far away, single label
    rows = [(i, [0.001 * i, 0.0], 0) for i in range(9)] + [(99, [0.4, 0.4], 0)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = embedding_outliers(df, top_k=1).collect()
    assert len(got) == 1
    assert got[0].vec_id == 99 and got[0].rnk == 1


def test_embedding_outliers_partition_invariant(spark):
    from data_wrangling_spark.operators.similarity import embedding_outliers

    emb = load_table(spark, SF_DIR, "embeddings")
    a = [(r.label, r.vec_id, r.dist2, r.rnk)
         for r in embedding_outliers(emb, top_k=3).collect()]
    b = [(r.label, r.vec_id, r.dist2, r.rnk)
         for r in embedding_outliers(emb.repartition(17), top_k=3).collect()]
    assert a == b


def test_embedding_outliers_rank_ties_break_by_id(spark):
    from data_wrangling_spark.operators.similarity import embedding_outliers

    # centroid is (0.2, 0.2): the origin vector is farthest (rank 1);
    # the two identical vectors tie on dist2 -> lower id ranks first
    rows = [(1, [0.3, 0.3], 0), (2, [0.3, 0.3], 0), (3, [0.0, 0.0], 0)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r.rnk: r.vec_id for r in embedding_outliers(df, top_k=3).collect()}
    assert got == {1: 3, 2: 1, 3: 2}


def test_embedding_outliers_empty_vector_fails_loudly(spark):
    """Round-9 advisor find: the flat (label, dim) rework made empty
    vectors silently VANISH (posexplode emits no rows) where the old
    array form returned them with NULL dist2. Empty vectors now raise
    via a codegen assert_true guard; NULL-element / ragged vectors are
    documented preconditions."""
    import pytest

    from data_wrangling_spark.operators.similarity import embedding_outliers

    good = spark.createDataFrame(
        [(1, [1.0, 2.0], "a"), (2, [0.5, 1.5], "a")],
        "vec_id long, embedding array<double>, label string",
    )
    assert embedding_outliers(good).count() == 2
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0], "a"), (2, [], "a")],
        "vec_id long, embedding array<double>, label string",
    )
    with pytest.raises(Exception, match="empty embedding vector"):
        embedding_outliers(bad).count()
