"""Blocked Levenshtein fuzzy join semantics: the -1 sentinel from
Spark's thresholded levenshtein must never leak through, blocking must
equal the brute-force answer restricted to same-block pairs, and the
thresholded plan must match the unbounded-distance plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangling_spark.operators.fuzzy import edit_distance, fuzzy_self_join

ROWS = [
    # (id, name, block)
    (1, "small ring", "A"),
    (2, "small king", "A"),     # dist 1 from id 1
    (3, "smalls ring", "A"),    # dist 1 from id 1, 2 from id 2
    (4, "large bolt", "A"),     # far from everything
    (5, "small ring", "B"),     # same text as id 1 but other block
    (6, "smal ring", "B"),      # dist 1 from id 5
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, name string, block string")


def test_matches_brute_force_within_blocks(spark):
    got = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_self_join(_df(spark), "id", "name", "block", 2).collect()
    }
    want = {}
    for ia, ta, ba in ROWS:
        for ib, tb, bb in ROWS:
            if ia < ib and ba == bb:
                d = _lev(ta, tb)
                if d <= 2:
                    want[(ia, ib)] = d
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 1
    assert (5, 6) in got
    # blocking trade-off: cross-block identical texts are NOT paired
    assert (1, 5) not in got


def test_threshold_sentinel_filtered(spark):
    """Over-threshold pairs return -1 from levenshtein(l, r, t); a
    naive `distance <= max` filter would keep them all."""
    out = fuzzy_self_join(_df(spark), "id", "name", "block", 1).collect()
    assert all(r.distance >= 0 for r in out)
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2), (1, 3), (5, 6)}


def test_unbounded_edit_distance_agrees(spark):
    df = _df(spark)
    a, b = df.alias("a"), df.alias("b")
    pairs = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.name").alias("na"), F.col("b.name").alias("nb"),
            edit_distance(F.col("a.name"), F.col("b.name")).alias("d"),
        )
        .collect()
    )
    for r in pairs:
        assert r.d == _lev(r.na, r.nb)


def _lev(s: str, t: str) -> int:
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[-1]


def test_sorted_neighborhood_matches_brute_force_on_adjacent_typos(spark):
    """Names differing by one LATE-character edit share a prefix and
    sort adjacently — SNM must find exactly the brute-force pairs."""
    from pyspark.sql import functions as F

    from data_wrangling_spark.operators.fuzzy import sorted_neighborhood_join

    base = [
        "apple", "banana", "carrot", "dolphin", "elephant", "falcon",
        "guitar", "hammer", "island", "jacket", "kitten", "ladder",
    ]  # pairwise Levenshtein > 2: only planted variants can pair
    rows = []
    for i, name in enumerate(base):
        rows.append((2 * i, name))
        rows.append((2 * i + 1, name + "x"))  # 1-edit variant, same prefix
    df = spark.createDataFrame(rows, "id long, name string")

    got = sorted(
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_join(df, "id", "name", window=4).collect()
    )
    # brute force ground truth
    import itertools

    brute = sorted(
        (a_id, b_id)
        for (a_id, a_n), (b_id, b_n) in itertools.combinations(rows, 2)
        if _lev(a_n, b_n) <= 2
    )
    assert got == brute


def test_sorted_neighborhood_pairs_unique_and_canonical(spark):
    from data_wrangling_spark.operators.fuzzy import sorted_neighborhood_join

    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aab"), (3, "aac"), (4, "aad")], "id long, name string"
    )
    out = sorted_neighborhood_join(df, "id", "name", window=4).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert len(pairs) == len(set(pairs))          # no duplicates
    assert all(a < b for a, b in pairs)           # canonical order
    txt = {(r.id_a, r.id_b): (r.txt_a, r.txt_b) for r in out}
    assert txt[(1, 2)] == ("aaa", "aab")          # texts follow their ids
