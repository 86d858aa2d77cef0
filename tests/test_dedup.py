"""Semantics tests for the dedup operators that have no SQL oracle:
MinHash-LSH recall vs exact Jaccard, SimHash on planted near-dups,
embedding-LSH vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangling_spark.operators import dedup
from data_wrangling_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def planted_docs(spark):
    """Corpus with exact dups, one-word-edit near-dups, and unrelated docs."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm window sill in the afternoon sun light"
    )
    near = base.replace("lazy", "sleepy")
    near2 = base.replace("afternoon", "morning")
    other = (
        "completely different content about distributed query engines "
        "running partitioned scans over columnar storage with vectorized "
        "execution and adaptive shuffle planning at petabyte scale"
    )
    rows = [
        (0, base),
        (1, base),        # exact dup of 0
        (2, near),        # near dup of 0
        (3, near2),       # near dup of 0
        (4, other),
        (5, other + " with extra trailing words appended here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_min_id(spark, planted_docs):
    out = dedup.dedup_exact(planted_docs, ["text"], id_col="doc_id")
    kept = sorted(r.doc_id for r in out.collect())
    assert 0 in kept and 1 not in kept  # min-id representative
    assert len(kept) == 5


def test_ngram_jaccard_finds_planted_pairs(spark, planted_docs):
    pairs = dedup.ngram_jaccard_pairs(planted_docs, "doc_id", "text", n=3, threshold=0.3)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (0, 1) in got  # exact dup → jaccard 1.0
    assert (0, 2) in got and (0, 3) in got  # one-word edits
    assert (0, 4) not in got and (1, 4) not in got  # unrelated


def test_minhash_lsh_recall_vs_exact(spark, planted_docs):
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(
            planted_docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_near_duplicates(
            planted_docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.35
        ).collect()
    }
    # high-similarity pairs must be recalled by the banded LSH
    assert exact <= approx, f"missed: {exact - approx}"
    # and LSH must not claim unrelated docs
    assert (0, 4) not in approx


def test_minhash_exact_dup_estimates_one(spark, planted_docs):
    out = dedup.minhash_near_duplicates(
        planted_docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.35
    )
    row = out.filter((F.col("doc_a") == 0) & (F.col("doc_b") == 1)).first()
    assert row is not None and row.est_jaccard == 1.0


def test_simhash_near_dups(spark, planted_docs):
    out = dedup.simhash_near_duplicates(planted_docs, "doc_id", "text", max_hamming=6)
    got = {(r.doc_a, r.doc_b) for r in out.collect()}
    assert (0, 1) in got  # identical text → hamming 0
    unrelated = out.filter((F.col("doc_a") == 0) & (F.col("doc_b") == 4)).count()
    assert unrelated == 0


def test_embedding_lsh_on_planted_near_dups(spark):
    """The synthetic corpus has no pairs above cosine ~0.51 (checked via
    DuckDB), so near-dup semantics are pinned on planted vectors: pairs of
    near-identical embeddings (tiny perturbation) plus unrelated ones."""
    import math

    dim = 16
    rows = []
    for i in range(20):
        # base direction per planted pair, deterministic
        base = [math.sin(0.7 * i + 0.13 * d) for d in range(dim)]
        nrm = math.sqrt(sum(x * x for x in base))
        base = [x / nrm for x in base]
        rows.append((2 * i, base))
        bumped = [x + (0.01 if d == i % dim else 0.0) for d, x in enumerate(base)]
        nrm2 = math.sqrt(sum(x * x for x in bumped))
        rows.append((2 * i + 1, [x / nrm2 for x in bumped]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_duplicates(
            df, "vec_id", "embedding", threshold=0.999, method="brute"
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_duplicates(
            df, "vec_id", "embedding", threshold=0.999, method="lsh"
        ).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(20)}
    assert planted <= brute  # brute finds every planted pair
    assert lsh <= brute  # exact verification → no false positives
    recall = len(lsh & planted) / len(planted)
    assert recall >= 0.9, f"LSH recall on near-identical pairs: {recall:.2f}"


def test_embedding_lsh_recall_at_threshold(spark):
    """Recall at the HARD case — pairs whose cosine is barely above the
    0.95 threshold (round-2 verdict item 4: recall@0.95 must be ≥ 0.8).
    80 pseudo-random near-orthogonal 64-dim base vectors, each with a
    planted partner at cosine exactly ~0.951; banded hyperplane LSH must
    recover ≥ 0.8 of the brute-force pairs (theory: ~0.985)."""
    import hashlib
    import math

    def prand(i: int, d: int) -> float:
        h = int.from_bytes(hashlib.md5(f"{i}:{d}".encode()).digest()[:4], "big")
        return h / 2**32 - 0.5

    dim, target = 64, 0.951
    rows = []
    for i in range(80):
        base = [prand(i, d) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in base))
        base = [x / n for x in base]
        orth = [prand(1000 + i, d) for d in range(dim)]
        dot = sum(a * b for a, b in zip(base, orth))
        orth = [o - dot * b for o, b in zip(orth, base)]
        n2 = math.sqrt(sum(x * x for x in orth))
        orth = [x / n2 for x in orth]
        c = math.sqrt(1 - target * target)
        rows.append((2 * i, base))
        rows.append((2 * i + 1, [target * b + c * o for b, o in zip(base, orth)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_duplicates(
            df, "vec_id", "embedding", threshold=0.95, method="brute"
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_duplicates(
            df, "vec_id", "embedding", threshold=0.95, method="lsh"
        ).collect()
    }
    assert len(brute) >= 80  # every planted pair clears the threshold
    assert lsh <= brute  # exact in-bucket verification: no false positives
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.8, f"banded-LSH recall at cosine≈{target}: {recall:.2f}"


def test_embedding_corpus_has_no_near_dups(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    brute = dedup.embedding_near_duplicates(
        emb, "vec_id", "embedding", threshold=0.95, method="brute"
    )
    assert brute.count() == 0  # documents why the registered query is empty


def test_keep_best_representative_policy(spark):
    """Keep-best curation dedup: highest score wins its group, ties break
    to the smallest id, singletons pass through, n_duplicates = group
    size."""
    df = spark.createDataFrame(
        [
            (1, "g1", 0.5),
            (2, "g1", 0.9),   # winner of g1 (best score)
            (3, "g1", 0.9),   # same score, larger id → loses the tie
            (4, "g2", 0.1),   # singleton
            (6, "g3", 0.7),
            (5, "g3", 0.7),   # tie → id 5 wins
        ],
        "doc_id long, grp string, score double",
    )
    out = {
        r.doc_id: r.n_duplicates
        for r in dedup.keep_best_representative(
            df, group_col="grp", score_col="score", id_col="doc_id"
        ).collect()
    }
    assert out == {2: 3, 4: 1, 5: 2}


def test_dedup_exact_null_subset_value_kept(spark):
    """A NULL in the subset column is a group like any other — the old
    groupBy+join-back implementation silently dropped it (null-unsafe
    join equality)."""
    from data_wrangling_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(
        [(1, None, "x"), (2, None, "y"), (3, "t", "z")],
        "id long, text string, extra string",
    )
    out = sorted((r.id, r.text, r.extra) for r in dedup_exact(df, ["text"], "id").collect())
    assert out == [(1, None, "x"), (3, "t", "z")]
    assert [f for f in dedup_exact(df, ["text"], "id").columns] == ["id", "text", "extra"]


def test_shingles_window_semantics(spark):
    """Pins the zip_with-of-slices rewrite (round 5: the element_at
    lambda form re-ran split() once per token per row) to the exact
    shingle sets of the old form: n-grams in order, short texts empty,
    n=1 distinct tokens, NULL text null (explode-equivalent to [])."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.dedup import shingles

    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b"), (2, None), (3, "x x x")],
        "id long, text string",
    )
    got = {r.id: r.s for r in df.select("id", shingles("text", n=3).alias("s")).collect()}
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []          # shorter than n
    assert got[2] is None        # null-in-null-out (explode drops it)
    assert got[3] == ["x x x"]   # distinct within doc
    uni = {r.id: r.s for r in df.select("id", shingles("text", n=1).alias("s")).collect()}
    assert uni[0] == ["a", "b", "c", "d"] and uni[3] == ["x"]
    # explode equivalence: null and empty both contribute zero rows
    n_rows = df.select(F.explode(shingles("text", n=3))).count()
    assert n_rows == 3


def test_shingles_from_tokens_matches_expression_form(spark):
    """The fast pre-staged-column form must agree with the safe
    expression form on every edge: normal, short, NULL, repeated."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.functions.text import tokens
    from data_wrangling_spark.operators.dedup import (
        shingles,
        shingles_from_tokens,
    )

    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b"), (2, None), (3, "x x x x"), (4, "")],
        "id long, text string",
    )
    staged = df.select("id", tokens("text").alias("_toks"))
    for n in (1, 2, 3):
        want = {r.id: r.s for r in df.select(
            "id", shingles("text", n=n).alias("s")).collect()}
        got = {r.id: r.s for r in staged.select(
            "id", shingles_from_tokens(F.col("_toks"), n=n).alias("s")
        ).collect()}
        assert got == want, n


def test_minhash_simhash_match_independent_pure_python_derivation(spark):
    """Dual-implementation oracle (same independence standard as
    plans/osm_oracle.py): the registered minhash-LSH and simhash queries
    must equal a pure-Python re-derivation built on the PUBLISHED XXH64
    algorithm (scripts/pure_seeded_reference.py), sharing no code with
    operators/dedup.py. This is the standing form of the capture-time
    gate in scripts/capture_seeded_goldens.py."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import duckdb
    import pure_seeded_reference as R

    from data_wrangling_spark.plans.registry import QUERIES, queries

    queries()
    docs = duckdb.query(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()
    got_mh = [
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in QUERIES["x_dedup_minhash_lsh"].spark(spark, SF_DIR).collect()
    ]
    assert got_mh == R.derive_minhash_pairs(docs, threshold=0.35)
    got_sh = [
        (r.doc_a, r.doc_b, r.hamming)
        for r in QUERIES["x_dedup_simhash"].spark(spark, SF_DIR).collect()
    ]
    assert got_sh == R.derive_simhash_pairs(docs, max_hamming=3)


def test_pure_python_derivation_whitespace_edges(spark):
    """The dual implementation must agree on whitespace the corpus never
    exercises: leading tabs (Spark trim strips only ' '), U+00A0 and
    thin space (Java \\s is ASCII-only, Python's is Unicode-aware),
    vertical tab / form feed. Hand-built corpus, both operators."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import pure_seeded_reference as R

    from data_wrangling_spark.operators.dedup import (
        minhash_near_duplicates,
        simhash_near_duplicates,
    )

    docs = [
        (1, "\tshared prefix tokens here alpha beta gamma delta"),
        (2, " shared prefix tokens here alpha beta gamma delta"),
        (3, "shared prefix tokens here alpha beta gamma delta"),
        (4, "shared prefix tokens here alpha beta gamma delta"),
        (5, "a\x0bb shared prefix tokens here alpha beta gamma\fdelta"),
        (6, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got_sh = [
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_duplicates(df, "doc_id", "text", max_hamming=10)
        .orderBy("doc_a", "doc_b").collect()
    ]
    assert got_sh == R.derive_simhash_pairs(docs, max_hamming=10)
    got_mh = [
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in minhash_near_duplicates(
            df, "doc_id", "text", num_hashes=64, bands=16, threshold=0.2
        ).orderBy("doc_a", "doc_b").collect()
    ]
    assert got_mh == R.derive_minhash_pairs(docs, threshold=0.2)


def test_embedding_lsh_queries_match_independent_derivation(spark):
    """Dual-implementation oracle for the float-arithmetic seeded
    queries: x_dedup_embedding_cosine and x_sim_topk_lsh must equal the
    pure-Python fold-order-exact re-derivation (hyperplane weights from
    the documented spec, sequential-fold float64 dot/cosine — bit-
    identical to the engine's F.aggregate fold)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import duckdb
    import pure_seeded_reference as R

    from data_wrangling_spark.plans.registry import QUERIES, queries

    queries()
    vecs = [
        (i, list(v) if v is not None else None)
        for i, v in duckdb.query(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
    ]
    got_ec = [
        (r.id_a, r.id_b, r.cosine)
        for r in QUERIES["x_dedup_embedding_cosine"].spark(spark, SF_DIR).collect()
    ]
    assert got_ec == R.derive_embedding_cosine_pairs(vecs)
    got_lsh = [
        (r.query_id, r.neighbor_id, r.score, r.rank)
        for r in QUERIES["x_sim_topk_lsh"].spark(spark, SF_DIR).collect()
    ]
    assert got_lsh == R.derive_topk_lsh(vecs)


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def semantic_vectors(spark):
    """Tiny embedding corpus with planted near-duplicates: id 100 is a
    rescaled copy of id 0 (cosine exactly ~1), id 101 a rescale of id 1;
    the rest are axis-aligned-ish and mutually dissimilar."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.2]),
        (1, [0.0, 1.0, 0.1, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [-1.0, 0.1, 0.0, 0.0]),
        (4, [0.3, 0.3, -0.9, 0.1]),
        (100, [1.1, 0.0, 0.0, 0.22]),   # 1.1 x id 0
        (101, [0.0, 0.9, 0.09, 0.0]),   # 0.9 x id 1
    ]
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_semantic_dedup_prunes_planted_rescales(spark, semantic_vectors):
    out = {
        r.vec_id: r
        for r in dedup.semantic_dedup(
            semantic_vectors, n_clusters=3, iters=2
        ).collect()
    }
    assert len(out) == 7
    # rescaled copies are cosine-1 near-dups; the SMALLER id survives
    assert out[0].kept and not out[100].kept
    assert out[1].kept and not out[101].kept
    # a near-dup pair is only prunable inside one cluster
    assert out[0].cluster_id == out[100].cluster_id
    assert out[1].cluster_id == out[101].cluster_id
    # dissimilar vectors all survive
    for vid in (2, 3, 4):
        assert out[vid].kept


def test_semantic_dedup_partition_invariant(spark, semantic_vectors):
    """Exact integer arithmetic end-to-end: the result cannot depend on
    partitioning (no float accumulation order anywhere)."""
    base = sorted(
        map(tuple, dedup.semantic_dedup(
            semantic_vectors, n_clusters=3, iters=2
        ).collect())
    )
    for parts in (1, 7):
        got = sorted(
            map(tuple, dedup.semantic_dedup(
                semantic_vectors.repartition(parts), n_clusters=3, iters=2
            ).collect())
        )
        assert got == base


def test_semantic_dedup_matches_independent_python_derivation(spark):
    """Dual-implementation check (the plans/osm_oracle.py standard): a
    pure-Python re-derivation of the documented semantics — quantize,
    multiplicative-hash seeds, integer Lloyd with floor(sum/count)
    updates, sqrt-free integer cosine test — must reproduce the operator
    on the real embeddings table."""
    import math

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    got = sorted(
        map(tuple, dedup.semantic_dedup(emb, n_clusters=4, iters=2).collect())
    )

    rows = emb.collect()
    qv = {
        r.vec_id: [int(math_round(float(x) * 1_000_000)) for x in r.embedding]
        for r in rows
    }
    k, iters, tau2 = 4, 2, 950 * 950
    seeds = sorted(qv, key=lambda i: ((i % (1 << 20)) * 2654435761 % (1 << 20), i))[:k]
    cents = [list(qv[i]) for i in seeds]

    def nearest(v):
        best = None
        for j, c in enumerate(cents):
            d = sum((a - b) * (a - b) for a, b in zip(v, c))
            if best is None or (d, j) < best:
                best = (d, j)
        return best[1]

    for _ in range(iters):
        sums, cnts = {}, {}
        for i, v in qv.items():
            j = nearest(v)
            cnts[j] = cnts.get(j, 0) + 1
            s = sums.setdefault(j, [0] * len(v))
            for p, x in enumerate(v):
                s[p] += x
        for j in sums:
            cents[j] = [
                math.floor(float(s) / float(cnts[j])) for s in sums[j]
            ]
    cell = {i: nearest(v) for i, v in qv.items()}
    n2 = {i: sum(x * x for x in v) for i, v in qv.items()}
    dup = set()
    for b in qv:
        for a in qv:
            if a < b and cell[a] == cell[b]:
                dot = sum(x * y for x, y in zip(qv[a], qv[b]))
                if dot > 0 and dot * dot * 1_000_000 >= tau2 * n2[a] * n2[b]:
                    dup.add(b)
                    break
    want = sorted((i, cell[i], i not in dup) for i in qv)
    assert got == want


def math_round(x: float) -> int:
    """ROUND half-away-from-zero — what Spark's round() and DuckDB's
    ROUND() both do (Python's built-in round is banker's)."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_source_overlap_symmetric_identity(spark):
    """source_overlap semantics: a source overlapped with a copy of
    itself under another label shares its whole vocabulary (jaccard 1),
    and disjoint-vocabulary sources produce no row."""
    rows = [
        (1, "alpha beta gamma delta", "s1"),
        (2, "alpha beta gamma delta", "s2"),     # exact copy of s1
        (3, "one two three four five", "s3"),    # disjoint vocabulary
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r.source_a, r.source_b): r for r in
           dedup.source_overlap(df, "source", "text", n=3).collect()}
    assert set(got) == {("s1", "s2")}
    r = got[("s1", "s2")]
    assert r.n_shared == r.n_a == r.n_b == 2  # two distinct trigrams
    assert r.jaccard_ppm == 1_000_000


def test_ngram_jaccard_max_df_prunes_stop_shingles(spark):
    """max_df drops ubiquitous shingles before the pair join and
    recomputes sizes on the pruned postings — docs related ONLY through
    a boilerplate phrase stop pairing, while genuine near-dups keep an
    exact (pruned-set) Jaccard."""
    boiler = "all rights reserved by the publisher"
    rows = [
        (0, "unique alpha beta gamma delta words " + boiler),
        (1, "different epsilon zeta eta theta words " + boiler),
        (2, "unique alpha beta gamma delta words " + boiler),  # dup of 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    unpruned = {(r.doc_a, r.doc_b)
                for r in dedup.ngram_jaccard_pairs(
                    df, "doc_id", "text", threshold=0.2).collect()}
    assert (0, 1) in unpruned  # boilerplate alone links them
    pruned = {(r.doc_a, r.doc_b): r
              for r in dedup.ngram_jaccard_pairs(
                  df, "doc_id", "text", threshold=0.2, max_df=2).collect()}
    assert (0, 1) not in pruned and (1, 2) not in pruned
    assert pruned[(0, 2)].jaccard == 1.0  # real dup survives, exact on pruned sets


def test_dedup_incremental_statuses(spark):
    from data_wrangling_spark.operators.dedup import dedup_incremental

    idx = spark.createDataFrame(
        [(1, "the quick brown fox jumps over dogs"),
         (2, "completely different index content here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # exact (normalized: case + punctuation differences collapse)
            (10, "The QUICK brown fox, jumps over dogs!"),
            # near: shares most trigrams with doc 1 but one word changed
            (11, "the quick brown fox jumps over cats"),
            # fresh
            (12, "entirely novel text with no overlap whatsoever"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.status, r.match_id)
           for r in dedup_incremental(new, idx, threshold=0.3).collect()}
    assert got[10] == ("exact_dup", 1)
    assert got[11] == ("near_dup", 1)
    assert got[12] == ("fresh", None)


def test_dedup_incremental_exact_beats_near(spark):
    from data_wrangling_spark.operators.dedup import dedup_incremental

    idx = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], "doc_id long, text string"
    )
    # identical to doc 2 AND near doc 1: exact wins, match is doc 2
    new = spark.createDataFrame(
        [(10, "a b c d e g")], "doc_id long, text string"
    )
    r = dedup_incremental(new, idx).collect()[0]
    assert (r.status, r.match_id) == ("exact_dup", 2)


def test_dedup_incremental_match_is_smallest_index_id(spark):
    from data_wrangling_spark.operators.dedup import dedup_incremental

    idx = spark.createDataFrame(
        [(7, "x y z w v u"), (3, "x y z w v u")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "x y z w v u")], "doc_id long, text string"
    )
    r = dedup_incremental(new, idx).collect()[0]
    assert r.match_id == 3


def test_dedup_incremental_max_df_prunes_stop_shingles(spark):
    """max_df semantics mirror ngram_jaccard_pairs: sizes are
    recomputed on the PRUNED postings, so the value is the exact
    Jaccard of the pruned shingle sets. Doc 10's pruned Jaccard vs
    index doc 1 is 2/7 (>= 0.25); the pre-fix pre-prune sizes gave
    2/15 and silently classified it fresh. Doc 11 is related to the
    index ONLY through the boilerplate phrase and must become fresh."""
    from data_wrangling_spark.operators.dedup import dedup_incremental

    boiler = "c1 c2 c3 c4 c5 c6"
    idx = spark.createDataFrame(
        [(1, "p q r s " + boiler), (2, "z1 z2 z3 " + boiler)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "p q r s t " + boiler), (11, "m1 m2 m3 " + boiler)],
        "doc_id long, text string",
    )
    unpruned = {
        r.doc_id: r.status
        for r in dedup_incremental(new, idx, threshold=0.25).collect()
    }
    assert unpruned[11] == "near_dup"  # boilerplate alone links it
    got = {
        r.doc_id: (r.status, r.match_id)
        for r in dedup_incremental(
            new, idx, threshold=0.25, max_df=2
        ).collect()
    }
    assert got[10] == ("near_dup", 1)  # exact pruned Jaccard 2/7
    assert got[11] == ("fresh", None)  # boilerplate-only pair stops


def test_gram_hashes_align_with_shingles(spark):
    """gram_hashes_from_tokens must dedup in the SAME positions as
    shingles_from_tokens (equal grams -> equal hashes, so array_distinct
    keeps both arrays position-aligned) — boilerplate_spans zips them.
    Also: [] for short texts, NULL for NULL, and no aliasing across
    shifted token boundaries ('ab c' vs 'a bc')."""
    from data_wrangling_spark.functions.text import tokens
    from data_wrangling_spark.operators.dedup import (
        gram_hashes_from_tokens,
        shingles_from_tokens,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b d"),   # repeated grams dedup
            (2, "x y"),                  # shorter than n -> []
            (3, None),                   # NULL -> NULL
            (4, "ab c d"),               # boundary-shift probe
            (5, "a bc d"),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        shingles_from_tokens(tokens("text"), 3).alias("s"),
        gram_hashes_from_tokens(tokens("text"), 3).alias("h"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    r1 = by_id[1]
    assert len(r1.s) == len(r1.h) == len(set(r1.s)) == len(set(r1.h))
    assert by_id[2].s == [] and by_id[2].h == []
    assert by_id[3].s is None and by_id[3].h is None
    # same-position grams hash identically across rows
    assert by_id[1].s[0] == "a b c"
    h_abc = by_id[1].h[0]
    re_hash = {s: h for s, h in zip(r1.s, r1.h)}
    assert re_hash["a b c"] == h_abc
    # shifted boundaries must not alias
    assert by_id[4].h != by_id[5].h


def test_prefix_filtered_jaccard_equals_plain(spark):
    """jaccard_pairs_prefix must produce EXACTLY ngram_jaccard_pairs'
    rows (prefix filtering is pruning, not approximation) on the full
    sf corpus, including the planted near-dups."""
    from data_wrangling_spark.operators.dedup import (
        jaccard_pairs_prefix,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    key = lambda r: (r.doc_a, r.doc_b, r.n_common, r.n_a, r.n_b,  # noqa: E731
                     round(r.jaccard, 9))
    plain = sorted(
        key(r) for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.3).collect()
    )
    pref = sorted(
        key(r) for r in jaccard_pairs_prefix(
            docs, "doc_id", "text", n=3, threshold=0.3).collect()
    )
    assert plain == pref
    assert plain, "corpus should contain at least one near-dup pair"


def test_prefix_filtering_actually_prunes_candidates(spark):
    """The point of the prefix scheme: on a corpus where every document
    shares a common boilerplate shingle, the full inverted-index join
    generates O(docs^2) candidates while the prefix join must not (the
    ubiquitous shingle sorts to every document's suffix)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_wrangling_spark.functions.text import tokens
    from data_wrangling_spark.operators.dedup import gram_hashes_from_tokens

    rows = [
        (i, f"common header line always present unique{i} token{i} "
            f"word{i} extra{i} tail{i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = df.select(
        F.col("doc_id").alias("doc"), tokens("text").alias("_toks")
    ).select(
        "doc",
        F.explode(gram_hashes_from_tokens(F.col("_toks"), 3)).alias("gram"),
    )
    full_pairs = (
        sh.alias("a").join(
            sh.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc") < F.col("b.doc")),
        ).select("a.doc", "b.doc").distinct().count()
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    dfreq = sh.groupBy("gram").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("doc").orderBy("_df", "gram")
    prefix = (
        sh.join(dfreq, "gram")
        .withColumn("_pos", F.row_number().over(w))
        .join(sizes, "doc")
        .filter(
            F.col("_pos")
            <= F.col("n_sh")
            - F.ceil(F.lit(0.5) * F.col("n_sh") - F.lit(1e-9)) + F.lit(1)
        )
        .select("doc", "gram")
    )
    prefix_pairs = (
        prefix.alias("a").join(
            prefix.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc") < F.col("b.doc")),
        ).select("a.doc", "b.doc").distinct().count()
    )
    # every pair shares the boilerplate shingles -> full join is the
    # complete 60*59/2 grid. At t=0.5 each doc's prefix (n - ceil(t n)
    # + 1 = 5 of 8) is exactly its FIVE unique grams (df=1 sorts before
    # the df=60 boilerplate), so the prefix join generates ZERO
    # candidates — and correctly, since no pair reaches Jaccard 0.5
    # (3 shared / 13 union ~ 0.23). At lower thresholds the theorem
    # forces shared grams into the prefix and pruning weakens: that is
    # the bound, not a defect.
    assert full_pairs == 60 * 59 // 2
    assert prefix_pairs == 0, (full_pairs, prefix_pairs)


def test_collapsed_jaccard_equals_plain_on_dup_dense_corpus(spark):
    """jaccard_pairs_collapsed (collapse exact dups -> prefix-Jaccard
    over representatives -> expand) must produce EXACTLY
    ngram_jaccard_pairs' rows on a corpus dense in exact-duplicate
    groups — the corpus shape the round-8 A/B showed plain prefix
    filtering is a wash on. Covers intra-group pairs (Jaccard 1.0),
    inter-group expansion with member-order swaps, whitespace-variant
    collapse (token-sequence fingerprint), and sub-n-token groups."""
    from data_wrangling_spark.operators.dedup import (
        jaccard_pairs_collapsed,
        ngram_jaccard_pairs,
    )

    rows = [
        # group A: ids 1, 9, 12 (bit-identical) + 20 (whitespace variant)
        (1, "alpha beta gamma delta epsilon zeta"),
        (9, "alpha beta gamma delta epsilon zeta"),
        (12, "alpha beta gamma delta epsilon zeta"),
        (20, "  alpha beta   gamma delta epsilon zeta "),
        # group B: ids 5, 6 — near-dup of A (shares a 4-token run)
        (5, "alpha beta gamma delta other words"),
        (6, "alpha beta gamma delta other words"),
        # singleton C: unrelated
        (7, "completely different content entirely here"),
        # group D: too short for 3-grams twice (no pairs expected)
        (30, "tiny doc"),
        (31, "tiny doc"),
        # null text: ignored everywhere
        (40, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    key = lambda r: (r.doc_a, r.doc_b, r.n_common, r.n_a, r.n_b,  # noqa: E731
                     round(r.jaccard, 9))
    plain = sorted(
        key(r) for r in ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.3).collect()
    )
    coll = sorted(
        key(r) for r in jaccard_pairs_collapsed(
            df, "doc_id", "text", n=3, threshold=0.3).collect()
    )
    assert plain == coll
    # sanity: the corpus exercises both expansion arms
    intra = [p for p in plain if p[5] == 1.0]
    inter = [p for p in plain if p[5] < 1.0]
    assert len(intra) >= 7 and inter, (intra, inter)
    # member-order swap arm: group A member 9 > group B member 5 while
    # rep(A)=1 < rep(B)=5 -> the expanded pair must be (5, 9) with
    # n_a/n_b swapped relative to the rep pair
    assert any(p[0] == 5 and p[1] == 9 for p in inter), inter


def test_collapsed_jaccard_equals_prefix_on_sf_corpus(spark):
    """On the sf corpus (few exact dups) the collapsed form must still
    agree with the prefix form exactly — the composition degrades to
    plain prefix filtering when groups are singletons."""
    from data_wrangling_spark.operators.dedup import (
        jaccard_pairs_collapsed,
        jaccard_pairs_prefix,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        "doc_id < 200"
    )
    key = lambda r: (r.doc_a, r.doc_b, r.n_common, r.n_a, r.n_b,  # noqa: E731
                     round(r.jaccard, 9))
    pref = sorted(
        key(r) for r in jaccard_pairs_prefix(
            docs, "doc_id", "text", n=3, threshold=0.3).collect()
    )
    coll = sorted(
        key(r) for r in jaccard_pairs_collapsed(
            docs, "doc_id", "text", n=3, threshold=0.3).collect()
    )
    assert pref == coll


# ---------------------------------------------------------------------------
# containment_pairs (round 10)
# ---------------------------------------------------------------------------

def _brute_containment(rows, n=3, threshold=0.6):
    """Independent pure-Python containment over string n-grams."""
    grams = {}
    for doc_id, text in rows:
        toks = text.split()
        grams[doc_id] = {
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
        }
    out = set()
    for a, ga in grams.items():
        if not ga:
            continue
        for b, gb in grams.items():
            if a == b:
                continue
            inter = len(ga & gb)
            if inter / len(ga) >= threshold:
                out.add((a, b, inter, len(ga), len(gb)))
    return out


def test_containment_snippet_inside_article(spark):
    article = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    snippet = "delta echo foxtrot golf hotel india"
    rows = [(0, article), (1, snippet)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.src_doc, r.dst_doc): r
        for r in dedup.containment_pairs(df, "doc_id", "text").collect()
    }
    # snippet fully contained: C(1 -> 0) = 1.0; the article is NOT
    # contained in the snippet (asymmetry)
    assert (1, 0) in got and (0, 1) not in got
    r = got[(1, 0)]
    assert r.containment == 1.0
    assert r.n_common == r.n_src == 4  # 6 tokens -> 4 trigrams
    assert r.n_dst == 18


def test_containment_matches_bruteforce(spark, planted_docs):
    got = {
        (r.src_doc, r.dst_doc, r.n_common, r.n_src, r.n_dst)
        for r in dedup.containment_pairs(
            planted_docs, "doc_id", "text", n=3, threshold=0.6
        ).collect()
    }
    want = _brute_containment(
        [(r.doc_id, r.text) for r in planted_docs.collect()],
        n=3, threshold=0.6,
    )
    assert got == want
    assert got, "planted corpus must produce at least the exact-dup pairs"


def test_containment_threshold_monotone(spark, planted_docs):
    loose = dedup.containment_pairs(
        planted_docs, "doc_id", "text", threshold=0.3
    ).count()
    tight = dedup.containment_pairs(
        planted_docs, "doc_id", "text", threshold=0.9
    ).count()
    assert loose >= tight


def test_containment_values_exact_division(spark, planted_docs):
    for r in dedup.containment_pairs(
        planted_docs, "doc_id", "text", threshold=0.6
    ).collect():
        assert r.containment == r.n_common / r.n_src
        assert r.containment >= 0.6
