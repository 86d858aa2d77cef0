"""Deterministic dataset splitting for training pipelines (SURVEY.md
§2.11 north-star extension surface; no reference counterpart — the
reference pipeline has no sampling or splitting).

`randomSplit` is the obvious tool and the wrong one for a 100 TB corpus:
its assignment depends on partitioning and sampling seeds, so re-running
after adding data reshuffles EVERYTHING across splits (train/test
contamination). The durable pattern is content-keyed hashing — a row's
split is a pure function of its id, stable under reprocessing, appends,
and engine changes.

The bucket function here (first 4 hex chars of md5 of the id string) is
chosen to be expressible IDENTICALLY in Spark and ANSI-ish SQL, so the
assignment is portable across engines — pinned by the DuckDB oracle on
ext_dataset_split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 65536  # 16 bits of md5


def hash_bucket(id_col: str | Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 65536) from the row id: first 4 hex
    chars of md5(id as string, plus an optional purpose salt), parsed
    base-16. Engine-portable. Distinct purposes (split vs sample) MUST
    use distinct salts — the same unsalted bucket would make their
    selections perfectly correlated instead of independent."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    keyed = F.concat(c.cast("string"), F.lit(salt)) if salt else c.cast("string")
    return F.conv(F.substring(F.md5(keyed), 1, 4), 16, 10).cast("int")


def dataset_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Assign each row a split label by hash bucket. ``fractions`` maps
    label → fraction (must sum to 1); thresholds are cumulative over
    N_BUCKETS in the given order."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    bucket = hash_bucket(id_col)
    expr: Column | None = None
    acc = 0.0
    labels = list(fractions.items())
    for label, frac in labels[:-1]:
        acc += frac
        threshold = int(round(acc * N_BUCKETS))
        cond = bucket < F.lit(threshold)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    split_col = (
        F.lit(labels[-1][0]) if expr is None else expr.otherwise(F.lit(labels[-1][0]))
    )
    # a null id gets a NULL split, not a silent ride into the last label
    # (otherwise() would route every null-id row into the test set)
    split_col = F.when(bucket.isNull(), F.lit(None).cast("string")).otherwise(split_col)
    return df.withColumn("split", split_col).withColumn("bucket", bucket)


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    fractions: dict[str, float] | None = None,
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across
    splits: collapse the near-duplicate ``pairs`` relation into
    connected components (operators/graph.py), give every document a
    ``group_id`` (its cluster's min member id; singletons use their own
    id), and hash-bucket the GROUP — so all members of a near-dup group
    land in the same split. Splitting by row id instead (the naive
    ``dataset_split``) puts ~2·p·(1-p) of every dup pair across the
    train/test boundary — the classic evaluation-contamination bug this
    operator exists to prevent.

    Singleton documents get the same split as plain
    ``dataset_split(df, id_col)`` would give them (group_id == id and
    the bucket function is identical) — adopting leakage safety never
    reshuffles the un-duplicated majority of the corpus.

    Returns (id_col, group_id, bucket, split).

    Scale shape: the component build is the bounded iterative label
    propagation of dedup_clusters (its input is the PAIRS relation —
    near-dup pairs, tiny next to the corpus); attaching groups is one
    left equi join on id; the split itself is a narrow md5 projection.
    """
    from data_wrangling_spark.operators.graph import dedup_clusters

    clusters = dedup_clusters(pairs, pair_a, pair_b)
    grouped = (
        df.join(clusters, df[id_col] == clusters["id"], "left")
        .withColumn("group_id", F.coalesce("cluster_id", F.col(id_col)))
        .drop("id", "cluster_id")
    )
    return dataset_split(grouped, "group_id", fractions)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    bucket falls under its stratum's rate — the corpus-rebalancing pass
    (e.g. downsample the dominant language) that stays reproducible
    under reprocessing and appends, unlike df.sample whose selection
    shifts with partitioning. A stratum's sample is a SUBSET of any
    larger rate's sample (nested samples for free).

    The bucket is salted with ':sample' so selection is INDEPENDENT of
    ``dataset_split``'s assignment on the same id (unsalted, a rate
    <= 0.8 would sample exclusively from the train split). Null-id rows
    are KEPT (mirroring dataset_split's null visibility) — exclude them
    upstream if that's not wanted."""
    bucket = hash_bucket(id_col, salt=":sample")
    threshold: Column = F.lit(int(round(default_rate * N_BUCKETS)))
    for value, rate in rates.items():
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(round(rate * N_BUCKETS)))
        ).otherwise(threshold)
    return df.filter(bucket.isNull() | (bucket < threshold))


def temperature_mixture(
    df: DataFrame,
    stratum_col: str,
    weight_expr: Column,
) -> DataFrame:
    """Temperature-scaled corpus mixture weights (mT5-style alpha
    sampling at alpha = 0.5): each stratum's sampling weight is
    sqrt(its token mass) renormalized over all strata, flattening the
    head so low-resource sources are upsampled relative to proportional
    sampling.

    alpha is FIXED at 0.5: IEEE-754 ``sqrt`` is correctly rounded, so
    the scaled weight is bit-identical on every engine (a ``pow(x, a)``
    for general alpha is not), and the fixed-point floor below makes the
    whole computation engine-exact — pinned by the DuckDB oracle on
    x_corpus_temperature_mixture.

    Scale shape: one hash aggregate (strata-sized output), then a 1-row
    total broadcast joined back — the same provably-tiny-broadcast
    pattern as the TF-IDF corpus count. Output columns: stratum,
    ``n_rows``, ``n_weight`` (raw mass), ``weight_ppm`` (mixture weight
    in parts-per-million, integer — sums to <= 1e6 with floor-division
    remainder).

    The ppm renormalization divides in DOUBLE (floor(w_fp / total *
    1e6)) rather than multiplying w_fp by 1e6 in bigint — the integer
    form overflows int64 once a stratum's mass reaches ~8.5e13 tokens
    (w_fp ~ 9.2e12), under 10x a 100 TB corpus (review find; ANSI mode
    would fail the job, non-ANSI would emit negative weights). The
    double form is exact while w_fp and the total stay below 2^53
    (total corpus mass ~8e19 tokens); beyond that it degrades by at
    most ±1 ppm, identically on every engine — division of identical
    doubles is IEEE-correctly-rounded.

    Negative stratum mass (a ``weight_expr`` that can go negative) is
    CLAMPED to 0 before the sqrt (advice find): unclamped,
    ``sqrt(negative)`` is NaN and Spark's non-ANSI ``floor(NaN) ->
    cast`` silently yields 0 while an ANSI engine (or the DuckDB
    oracle) errors — a silent cross-engine divergence. Clamping makes
    a negative-mass stratum an explicit zero-weight stratum on every
    engine; ``n_weight`` still reports the raw (possibly negative)
    mass.
    """
    per = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(weight_expr).cast("bigint").alias("n_weight"),
    )
    scaled = per.withColumn(
        "_w_fp",
        F.floor(
            F.sqrt(F.greatest(F.col("n_weight"), F.lit(0)).cast("double"))
            * F.lit(1000000.0)
        ).cast("bigint"),
    )
    total = scaled.agg(F.sum("_w_fp").alias("_w_total"))
    return (
        scaled.join(F.broadcast(total))
        .withColumn(
            "weight_ppm",
            F.floor(
                F.col("_w_fp").cast("double")
                / F.col("_w_total").cast("double")
                * F.lit(1000000.0)
            ).cast("bigint"),
        )
        .drop("_w_fp", "_w_total")
    )


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
) -> DataFrame:
    """Deterministic training-shard assignment + per-shard manifest —
    the last step of a curation pipeline before a training run reads
    the corpus: every document lands in shard
    ``hash_bucket(id, 'shard') % n_shards`` (content-keyed, so the
    layout is stable under reprocessing and appends, and adding data
    never moves existing docs between shards), and the manifest row per
    shard carries the counts a dataloader needs up front: document
    count, whitespace-token count, character count, id range, and an
    order-insensitive integer content checksum (sum of each doc's
    md5-prefix — verifiable after any copy without re-reading order).

    Returns (shard, n_docs, n_tokens, n_chars, min_id, max_id,
    checksum) ordered by shard.

    Scale shape: one narrow projection + one n_shards-group hash
    aggregate with map-side partials — the manifest is O(n_shards)
    rows however big the corpus is. The checksum is an integer SUM, so
    it is partitioning- and order-immune (the reason it is not a hash
    of concatenated text)."""
    from data_wrangling_spark.functions.text import token_count

    shard = (hash_bucket(id_col, salt="shard").cast("long") % n_shards).alias(
        "shard"
    )
    rows = df.select(
        shard,
        F.col(id_col).alias("_id"),
        F.coalesce(token_count(text_col), F.lit(0)).cast("long").alias("_tok"),
        F.coalesce(F.length(text_col), F.lit(0)).cast("long").alias("_chr"),
        F.coalesce(
            F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("long"),
            F.lit(0),
        ).alias("_ck"),
    )
    return (
        rows.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            F.sum("_chr").alias("n_chars"),
            F.min("_id").alias("min_id"),
            F.max("_id").alias("max_id"),
            F.sum("_ck").alias("checksum"),
        )
        .orderBy("shard")
    )


def source_cap(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    quality_col: str = "n_chars",
    cap: int = 10,
    tail_keep_ppm: int = 250000,
) -> DataFrame:
    """Per-source corpus balancing: keep the top ``cap`` documents of
    each source by quality (ties broken by id — deterministic), plus a
    content-keyed hash sample of the remainder at ``tail_keep_ppm``
    parts-per-million — the standard guard against one crawl domain
    swamping the mixture while still representing its tail. The sample
    is the splits.py md5 bucket (salted 'cap'), so membership is a pure
    function of the row id: stable under reprocessing, appends, and
    engine changes, unlike rand()-based sampling.

    Returns one accounting row per source: (source, n_docs, n_top,
    n_sampled, n_kept, kept_chars) ordered by source.

    Scale shape (round-13 rework; the previous single-window form
    funneled the WHOLE corpus through a window partitioned by the
    ~20-value source key — parallelism capped at n_sources tasks at
    any cluster size, and its rank was consumed by BOTH a <=cap and a
    >cap predicate so WindowGroupLimit could never fire):

    (a) the top set is its own branch with a genuine ``rank <= cap``
        filter, so Spark's InferWindowGroupLimit inserts a partial
        top-k BEFORE the exchange — at most ``cap`` rows per source
        per input partition are shuffled, and the low-cardinality
        window itself runs over that bounded set, never the corpus;
    (b) per-source totals (n_docs, hash-sample pass counts/chars) are
        ONE plain whole-stage-codegen hash aggregate over the corpus
        with map-side partials and NO window node;
    (c) the cap*n_sources-row top aggregate is broadcast onto the
        totals to subtract top rows that also pass the hash cut
        (n_sampled counts tail rows only), a pure arithmetic join.

    Net: zero data-sized windows, exactly one corpus-wide aggregate
    plus one WindowGroupLimit-bounded corpus scan. Measured at 100x
    (fresh-JVM medians): rework 0.66s vs the old single-window form's
    2.12s; stage probe puts the floor at the two corpus passes
    themselves — plain scan+agg 0.49s, +md5 bucket 0.84s, top branch
    0.89s — i.e. Spark's per-job/scan floor at a 0.6s absolute, not a
    shuffle or parallelism defect (the old form capped parallelism at
    n_sources tasks at ANY cluster size; this one scales with input
    partitions)."""
    # ppm → bucket threshold once, in Python integers: the engine-side
    # predicate is a pure integer compare (no float op to diverge)
    bucket_cut = (tail_keep_ppm * N_BUCKETS) // 1000000
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("_id"),
        F.col(quality_col).alias("_q"),
        hash_bucket(id_col, salt="cap").cast("long").alias("_b"),
    )
    passes = F.col("_b") < bucket_cut
    # (b) the only corpus-sized operation: one hash aggregate
    totals = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(passes.cast("long")).alias("_n_pass"),
        F.sum(F.when(passes, F.col("_q")).otherwise(0))
        .cast("long")
        .alias("_pass_chars"),
    )
    # (a) top-cap branch: the rank<=cap filter is the shape
    # InferWindowGroupLimit rewrites into partial per-partition top-k.
    # The md5 bucket is (re)computed AFTER the filter, so this branch
    # pays md5 on cap*n_sources rows, not the corpus (stage probe:
    # corpus-wide md5 adds ~70% to a plain scan+agg pass)
    w = Window.partitionBy("source").orderBy(F.col("_q").desc(), "_id")
    top_agg = (
        base.select("source", "_id", "_q")
        .withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= cap)
        .withColumn("_b", hash_bucket("_id", salt="cap").cast("long"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_top"),
            F.sum("_q").cast("long").alias("_top_chars"),
            F.sum(passes.cast("long")).alias("_n_top_pass"),
            F.sum(F.when(passes, F.col("_q")).otherwise(0))
            .cast("long")
            .alias("_top_pass_chars"),
        )
    )
    # (c) left join + coalesce: cap=0 leaves the top branch empty
    return (
        totals.join(F.broadcast(top_agg), "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_top", F.lit(0)).alias("n_top"),
            (F.col("_n_pass") - F.coalesce("_n_top_pass", F.lit(0))).alias(
                "n_sampled"
            ),
            (
                F.coalesce("n_top", F.lit(0))
                + F.col("_n_pass")
                - F.coalesce("_n_top_pass", F.lit(0))
            ).alias("n_kept"),
            (
                F.coalesce("_top_chars", F.lit(0))
                + F.col("_pass_chars")
                - F.coalesce("_top_pass_chars", F.lit(0))
            ).alias("kept_chars"),
        )
        .orderBy("source")
    )
