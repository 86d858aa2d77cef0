"""HLL sketch quality: union-of-daily-sketches weekly estimate must be
within the sketch's error bound of the exact distinct count (default
lgConfigK=12 → ~1.6% relative standard error; assert a generous 5%)."""

from __future__ import annotations

from data_wrangling_spark.plans.registry import QUERIES, queries
from tests.conftest import SF_DIR

queries()


def test_hll_weekly_union_error_bound(spark):
    rows = QUERIES["x_sketch_hll_weekly_users"].spark(spark, SF_DIR).collect()
    assert rows, "no weeks produced"
    for r in rows:
        err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert err <= 0.05, f"week {r.week}: approx {r.approx_users} vs exact {r.exact_users}"


def test_countmin_overestimates_never_under(spark):
    """Count-min's one-sided error: est ≥ true count for EVERY key (not
    just heavy hitters), and exact when the key's cells are
    collision-free."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )
    from data_wrangling_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select("user_id")
    sketch = countmin_sketch(ev, "user_id", depth=4, width=64)
    truec = ev.groupBy("user_id").agg(F.count("*").alias("true_cnt"))
    est = countmin_estimate(sketch, truec.select("user_id"), "user_id", 4, 64)
    joined = est.join(truec, "user_id").collect()
    assert joined
    assert all(r.est >= r.true_cnt for r in joined), [
        r for r in joined if r.est < r.true_cnt
    ][:3]


def test_countmin_merge_equals_single_build(spark):
    """Two half-stream sketches merged by cell-sum == the one-pass
    sketch — the property that lets per-partition/per-day sketches roll
    up without revisiting raw data."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.sketches import countmin_sketch
    from data_wrangling_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    merged = (
        countmin_sketch(half_a, "user_id")
        .unionByName(countmin_sketch(half_b, "user_id"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    single = countmin_sketch(ev, "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, single.collect())
    )


def test_countmin_int32_key_no_overflow(spark):
    """The hash must promote to 64-bit before multiplying: an INTEGER
    key column near int32-max would otherwise overflow (ANSI raises,
    non-ANSI silently diverges from bucket_sql's oracle)."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    df = spark.range(5).select((F.col("id") + 2_147_480_000).cast("int").alias("k"))
    sketch = countmin_sketch(df, "k", depth=4, width=64)
    est = countmin_estimate(sketch, df.distinct(), "k", 4, 64).collect()
    assert len(est) == 5 and all(r.est >= 1 for r in est)


def test_countmin_unseen_key_estimates_zero(spark):
    """A key the stream never touched must estimate 0 when any of its
    cells is empty — absent sketch cells count as 0, not as 'drop the
    key' or 'report a collision's count'."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    stream = spark.range(3).select(F.col("id").alias("k"))  # keys 0,1,2
    sketch = countmin_sketch(stream, "k", depth=4, width=1024)
    # width 1024 >> 3 keys: the probe key's cells are collision-free-empty
    probe = spark.range(500, 501).select(F.col("id").alias("k"))
    est = countmin_estimate(sketch, probe, "k", 4, 1024).collect()
    assert len(est) == 1 and est[0].est == 0


def test_approx_percentile_error_bound(spark):
    """t-digest-style approx_percentile (the mergeable scale path the
    ext_percentiles doc points to) stays within 1% relative error of the
    exact interpolated percentile on this distribution."""
    from pyspark.sql import functions as F
    from data_wrangling_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    row = orders.agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01, row


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every inserted key probes positive (the one-sided guarantee);
    non-members false-positive at roughly the designed rate, bounded
    loosely here (k=7, m/n=16 -> ~0.5% expected)."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    members = spark.range(1000).select(F.concat(F.lit("gram_"), "id").alias("g"))
    bloom = bloom_build(members, "g", k=7, m=16 * 1024)
    # members: all positive
    got = bloom_might_contain(members, bloom, "g", k=7, m=16 * 1024)
    assert got.filter(~F.col("might_contain")).count() == 0
    # non-members: few positives
    others = spark.range(2000).select(F.concat(F.lit("other_"), "id").alias("g"))
    fp = (
        bloom_might_contain(others, bloom, "g", k=7, m=16 * 1024)
        .filter(F.col("might_contain"))
        .count()
    )
    assert fp <= 2000 * 0.05, f"false-positive rate too high: {fp}/2000"


def test_bloom_merge_is_union(spark):
    """Element-wise OR of two bitsets == one build over the unioned
    keys — the mergeability that lets per-shard filters roll up."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.sketches import bloom_build

    a = spark.range(100).select(F.concat(F.lit("a"), "id").alias("g"))
    b = spark.range(100).select(F.concat(F.lit("b"), "id").alias("g"))
    wa = bloom_build(a, "g", m=4096).collect()[0].words
    wb = bloom_build(b, "g", m=4096).collect()[0].words
    merged = [x | y for x, y in zip(wa, wb)]
    single = bloom_build(a.unionByName(b), "g", m=4096).collect()[0].words
    assert merged == single


def test_bloom_duplicate_and_null_probe_keys(spark):
    """Row-local probing: duplicate probe rows each get the member
    verdict (the join-based form false-negatived them), and NULL keys
    behave consistently between build and probe."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    members = spark.createDataFrame([("x",), ("y",), (None,)], "g string")
    bloom = bloom_build(members, "g", m=4096)
    probes = spark.createDataFrame(
        [("x",), ("x",), ("x",), (None,), ("zzz_not_member",)], "g string"
    )
    got = bloom_might_contain(probes, bloom, "g", m=4096).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r.g, []).append(r.might_contain)
    assert by_key["x"] == [True, True, True]  # every duplicate row positive
    assert by_key[None] == [True]             # build/probe NULL-consistent


def test_bloom_reserved_output_column_refused(spark):
    import pytest
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    members = spark.range(5).select(F.col("id").cast("string").alias("g"))
    bloom = bloom_build(members, "g", m=4096)
    probes = members.withColumn("might_contain", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        bloom_might_contain(probes, bloom, "g", m=4096)


def test_hll_hash_matches_pure_python_replay(spark):
    """The portable HLL hash (fold -> xor-shift avalanche, two odd
    multiplies mod 2^32) re-derived in pure Python must match the
    Spark expressions bit-exactly on probe keys — the independent-
    derivation standard the MinHash family uses."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators import sketches as SK

    def fold32(k):
        return (k >> 32) ^ (k & 0xFFFFFFFF)

    def avalanche(x):
        x = ((x ^ (x >> 16)) * 0x45D9F3B) % (1 << 32)
        x = ((x ^ (x >> 16)) * 0x119DE1F3) % (1 << 32)
        return x ^ (x >> 16)

    def py_bucket(k, p=12):
        return avalanche(fold32(k)) % (1 << p)

    def py_rho(k):
        h2 = avalanche(fold32(k) ^ 0x9E3779B9)
        return 33 if h2 == 0 else 33 - len(bin(h2)[2:])

    probes = [0, 1, 2, 4095, 4096, 65535, 10**9, 2**31, 2**40 + 17, 2**62]
    df = spark.createDataFrame([(k,) for k in probes], "k long")
    got = {
        r.k: (r.b, r.r)
        for r in df.select(
            "k",
            SK.hll_bucket(F.col("k")).alias("b"),
            SK.hll_rho(F.col("k")).alias("r"),
        ).collect()
    }
    for k in probes:
        assert got[k] == (py_bucket(k), py_rho(k)), k


def test_hll_merge_equals_direct_build(spark):
    """Register tables merge by max: per-half sketches merged ==
    one-pass sketch over the union — the property that lets per-day /
    per-partition sketches roll up without revisiting raw data."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )
    from data_wrangling_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    merged = hll_merge(
        hll_registers(half_a, "user_id", []).unionByName(
            hll_registers(half_b, "user_id", [])
        ),
        [],
    )
    direct = hll_registers(ev, "user_id", [])
    assert sorted((r.bucket, r.rho_max) for r in merged.collect()) == sorted(
        (r.bucket, r.rho_max) for r in direct.collect()
    )
    est = lambda regs: hll_estimate(  # noqa: E731
        regs.withColumn("_g", F.lit(1)), ["_g"]
    ).collect()[0].approx_distinct
    assert est(merged) == est(direct)


def test_hll_null_keys_excluded_like_count_distinct(spark):
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    df = spark.createDataFrame(
        [(1,), (2,), (3,), (None,), (None,)], "k long"
    )
    regs = hll_registers(df, "k", [])
    est = hll_estimate(regs.withColumn("_g", F.lit(1)), ["_g"]).collect()[0]
    assert est.approx_distinct == 3  # linear counting is exact here


def test_hll_precision_mismatch_fails_fast(spark):
    """Round-7 advisor find: registers built at one p, estimated or
    merged at another, silently mis-computed V = m - |buckets|. The
    carried _hll_p column now raises at execution instead."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import PythonException

    from data_wrangling_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    regs12 = hll_registers(df, "k", [], p=12).withColumn("_g", F.lit(1))
    with pytest.raises(Exception, match="hll_estimate: registers built at p="):
        hll_estimate(regs12, ["_g"], p=10).collect()
    # merge of mismatched-precision parts raises too
    regs10 = hll_registers(df, "k", [], p=10).withColumn("_g", F.lit(1))
    with pytest.raises(Exception, match="different\\s+precisions|different precisions"):
        hll_merge(regs12.unionByName(regs10), ["_g"]).collect()
    # matched precision still estimates fine (linear-counting regime,
    # a few % collision error at 1000 keys / 4096 buckets)
    got = hll_estimate(regs12, ["_g"], p=12).collect()[0].approx_distinct
    assert abs(got - 1000) <= 50, got
    # legacy p-column-free tables: the bucket-range necessary condition
    legacy = regs12.drop("_hll_p")
    with pytest.raises(Exception, match="larger precision"):
        hll_estimate(legacy, ["_g"], p=8).collect()


def test_hll_merge_disjoint_bucket_mixed_p_raises(spark):
    """Round-8 advisor find: parts built at different p with DISJOINT
    bucket sets slipped past the per-(group, bucket) min/max guard and
    merged silently. The guard is now group-level (window over the
    merged register table), so any mixed-p merge raises as the
    docstring promises."""
    import pytest
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.sketches import (
        hll_merge,
        hll_registers,
    )

    df = spark.range(0, 500).select(F.col("id").alias("k"))
    regs12 = hll_registers(df, "k", [], p=12).withColumn("_g", F.lit(1))
    regs10 = hll_registers(df, "k", [], p=10).withColumn("_g", F.lit(1))
    # force-disjoint bucket domains: shift the p=10 buckets past 2^12 so
    # no (group, bucket) key collides with the p=12 part
    regs10_disjoint = regs10.withColumn(
        "bucket", F.col("bucket") + F.lit(1 << 13)
    )
    with pytest.raises(Exception, match="different\\s+precisions"):
        hll_merge(regs12.unionByName(regs10_disjoint), ["_g"]).collect()
    # same-p parts with disjoint buckets still merge fine
    half_a = regs12.filter(F.col("bucket") < 2048)
    half_b = regs12.filter(F.col("bucket") >= 2048)
    merged = hll_merge(half_a.unionByName(half_b), ["_g"])
    assert merged.count() == regs12.count()
