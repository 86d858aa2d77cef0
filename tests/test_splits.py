"""Dataset-split properties: deterministic per-id assignment (stable
under reprocessing/appends by construction), fractions approximately
honored, bucket function portable (pinned exactly by the oracle query)."""

from __future__ import annotations

from data_wrangling_spark.operators.splits import dataset_split
from data_wrangling_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_split_deterministic_and_append_stable(spark):
    docs = load_table(spark, SF_DIR, "documents")
    full = {r.doc_id: r.split for r in dataset_split(docs, "doc_id").collect()}
    # reprocessing a SUBSET (as after an append, the old rows) must give
    # the identical assignment for every pre-existing id
    subset = dataset_split(docs.filter("doc_id % 3 = 0"), "doc_id").collect()
    assert all(full[r.doc_id] == r.split for r in subset)
    # fractions approximately honored (small corpus → loose bounds)
    n = len(full)
    train = sum(1 for s in full.values() if s == "train") / n
    assert 0.7 < train < 0.9, train
    assert set(full.values()) <= {"train", "val", "test"}


def test_stratified_sample_nested_and_deterministic(spark):
    from data_wrangling_spark.operators.splits import stratified_sample

    docs = load_table(spark, SF_DIR, "documents")
    small = {r.doc_id for r in stratified_sample(docs, "doc_id", "lang", {"en": 0.1}, 0.3).collect()}
    large = {r.doc_id for r in stratified_sample(docs, "doc_id", "lang", {"en": 0.5}, 0.9).collect()}
    # nested: smaller rates select a subset of larger rates
    assert small <= large
    # deterministic: same call twice, same rows
    again = {r.doc_id for r in stratified_sample(docs, "doc_id", "lang", {"en": 0.1}, 0.3).collect()}
    assert small == again


def test_sample_independent_of_split(spark):
    """The sample bucket is salted: sampling at 50% must select from BOTH
    the train and the val/test side of the (unsalted) dataset split in
    roughly representative proportions — the unsalted bug made any rate
    <= 0.8 sample exclusively from train."""
    from data_wrangling_spark.operators.splits import dataset_split, stratified_sample

    docs = load_table(spark, SF_DIR, "documents")
    split = {r.doc_id: r.split for r in dataset_split(docs, "doc_id").collect()}
    sampled = {r.doc_id for r in stratified_sample(docs, "doc_id", "lang", {}, 0.5).collect()}
    sampled_splits = {split[d] for d in sampled}
    assert "train" in sampled_splits and ("val" in sampled_splits or "test" in sampled_splits)


def test_temperature_mixture_flattens_head(spark):
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.splits import temperature_mixture

    # source A has 100x the token mass of B: proportional weight would be
    # ~990099 ppm; sqrt-temperature flattens it to ~909090 ppm (10:1)
    rows = [("A", "w " * 100)] * 100 + [("B", "w " * 100)]
    df = spark.createDataFrame(rows, "source string, text string")
    from data_wrangling_spark.functions.text import token_count

    got = {
        r.source: r
        for r in temperature_mixture(df, "source", token_count("text")).collect()
    }
    assert got["A"].n_weight == 100 * got["B"].n_weight
    assert abs(got["A"].weight_ppm - 909090) <= 2
    assert abs(got["B"].weight_ppm - 90909) <= 2


def test_temperature_mixture_equal_strata_equal_weights(spark):
    from data_wrangling_spark.functions.text import token_count
    from data_wrangling_spark.operators.splits import temperature_mixture

    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "p q r"), ("c", "u v w")],
        "source string, text string",
    )
    rows = temperature_mixture(df, "source", token_count("text")).collect()
    ppms = {r.weight_ppm for r in rows}
    assert len(ppms) == 1
    assert abs(rows[0].weight_ppm - 333333) <= 1


def test_temperature_mixture_ppm_sums_below_million(spark):
    from data_wrangling_spark.functions.text import token_count
    from data_wrangling_spark.operators.splits import temperature_mixture

    df = spark.createDataFrame(
        [(f"s{i % 7}", "tok " * (i % 13 + 1)) for i in range(200)],
        "source string, text string",
    )
    rows = temperature_mixture(df, "source", token_count("text")).collect()
    total = sum(r.weight_ppm for r in rows)
    # floor division loses < 1 ppm per stratum
    assert 1000000 - len(rows) <= total <= 1000000


def test_temperature_mixture_matches_python_model(spark):
    """Model-based: ppm weights equal the pure-Python fixed-point
    computation (floor(sqrt(mass)*1e6), integer floor-div renormalize)
    for uneven strata."""
    import math

    from data_wrangling_spark.functions.text import token_count
    from data_wrangling_spark.operators.splits import temperature_mixture

    rows = []
    masses = {"a": 1, "b": 7, "c": 100, "d": 3163}
    for src, m in masses.items():
        # one doc of m tokens per stratum
        rows.append((src, " ".join("t" for _ in range(m))))
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r.source: (r.n_rows, r.n_weight, r.weight_ppm)
        for r in temperature_mixture(df, "source", token_count("text")).collect()
    }
    w_fp = {s: math.floor(math.sqrt(m) * 1_000_000.0) for s, m in masses.items()}
    total = sum(w_fp.values())
    for s, m in masses.items():
        # double-division formula, exactly as both engines compute it
        assert got[s] == (1, m, math.floor(w_fp[s] / total * 1_000_000.0))


def test_temperature_mixture_clamps_negative_mass(spark):
    """Advice regression: a weight_expr that goes negative used to feed
    sqrt(negative) -> NaN, which Spark's non-ANSI floor/cast silently
    turned into 0 while an ANSI engine errors. Negative mass must clamp
    to an explicit zero-weight stratum; n_weight keeps the raw value."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.splits import temperature_mixture

    df = spark.createDataFrame(
        [("neg", -5), ("neg", -3), ("pos", 4)], "source string, w bigint"
    )
    got = {
        r.source: (r.n_weight, r.weight_ppm)
        for r in temperature_mixture(df, "source", F.col("w")).collect()
    }
    assert got["neg"] == (-8, 0)
    assert got["pos"] == (4, 1_000_000)


def test_leakage_safe_split_never_splits_a_pair(spark):
    """The defining property: both members of every near-dup pair (and
    by transitivity every member of a component) land in ONE split."""
    from data_wrangling_spark.operators.dedup import ngram_jaccard_pairs
    from data_wrangling_spark.operators.splits import leakage_safe_split
    from data_wrangling_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3)
    out = leakage_safe_split(docs, "doc_id", pairs)
    split_of = {r.doc_id: r.split for r in out.collect()}
    pair_rows = pairs.collect()
    assert pair_rows, "fixture corpus must contain near-dup pairs"
    for p in pair_rows:
        assert split_of[p.doc_a] == split_of[p.doc_b], (p.doc_a, p.doc_b)


def test_leakage_safe_split_singletons_match_plain_split(spark):
    """Docs in no near-dup group keep exactly the split plain
    dataset_split gives them — leakage safety is a no-op for the
    un-duplicated majority."""
    from data_wrangling_spark.operators.dedup import ngram_jaccard_pairs
    from data_wrangling_spark.operators.splits import (
        dataset_split,
        leakage_safe_split,
    )
    from data_wrangling_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3)
    safe = {r.doc_id: (r.group_id, r.split)
            for r in leakage_safe_split(docs, "doc_id", pairs).collect()}
    plain = {r.doc_id: r.split for r in dataset_split(docs, "doc_id").collect()}
    singles = [d for d, (g, _) in safe.items() if g == d]
    assert singles
    for d in singles:
        assert safe[d][1] == plain[d]


def test_shard_manifest_accounts_for_every_doc(spark):
    from data_wrangling_spark.operators.splits import shard_manifest

    docs = load_table(spark, SF_DIR, "documents")
    m = shard_manifest(docs, n_shards=8).collect()
    assert sum(r.n_docs for r in m) == docs.count()
    assert sum(r.n_chars for r in m) == docs.selectExpr(
        "sum(length(text))"
    ).collect()[0][0]
    assert all(0 <= r.shard < 8 for r in m)


def test_shard_manifest_append_never_moves_existing_docs(spark):
    from data_wrangling_spark.operators.splits import hash_bucket

    # shard is a pure function of the id: compute on a subset, then on a
    # superset — identical assignment for the shared rows
    docs = load_table(spark, SF_DIR, "documents")
    sub = docs.filter("doc_id < 100")
    f = lambda d: {
        r.doc_id: r.s
        for r in d.select(
            "doc_id",
            (hash_bucket("doc_id", salt="shard").cast("long") % 64).alias("s"),
        ).collect()
    }
    full, part = f(docs), f(sub)
    assert all(full[k] == v for k, v in part.items())


def test_shard_manifest_checksum_is_order_immune(spark):
    from data_wrangling_spark.operators.splits import shard_manifest

    docs = load_table(spark, SF_DIR, "documents")
    a = {r.shard: r.checksum for r in shard_manifest(docs, n_shards=4).collect()}
    b = {
        r.shard: r.checksum
        for r in shard_manifest(docs.repartition(13), n_shards=4).collect()
    }
    assert a == b


def test_source_cap_accounting(spark):
    from data_wrangling_spark.operators.splits import source_cap

    docs = load_table(spark, SF_DIR, "documents")
    rows = source_cap(docs, cap=10, tail_keep_ppm=250000).collect()
    per_source = {
        r.source: r.n
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    for r in rows:
        assert r.n_docs == per_source[r.source]
        assert r.n_top == min(10, r.n_docs)
        assert r.n_kept == r.n_top + r.n_sampled
        assert 0 <= r.n_sampled <= r.n_docs - r.n_top


def test_source_cap_zero_tail_rate_keeps_only_top(spark):
    from data_wrangling_spark.operators.splits import source_cap

    docs = load_table(spark, SF_DIR, "documents")
    rows = source_cap(docs, cap=3, tail_keep_ppm=0).collect()
    assert all(r.n_sampled == 0 and r.n_kept == min(3, r.n_docs) for r in rows)
