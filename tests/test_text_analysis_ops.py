"""tf_idf and repetition_signals unit semantics on constructed corpora
(the registry oracle tests pin them against DuckDB at sf0.001; these pin
the hand-checkable cases)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_wrangling_spark.operators.text_analysis import repetition_signals, tf_idf


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_tfidf_hand_computed(spark):
    # "cat" appears in 1 of 2 docs -> idf = ln(2); "the" in both -> idf = 0
    docs = _docs(spark, ["the cat", "the dog dog"])
    got = {(r.doc_id, r.term): r.tfidf for r in tf_idf(docs, top_k=10).collect()}
    assert got[(0, "cat")] == round(0.5 * math.log(2), 4)
    assert got[(0, "the")] == 0.0
    assert got[(1, "dog")] == round((2 / 3) * math.log(2), 4)


def test_tfidf_rank_deterministic_on_ties(spark):
    # both rare terms tie on score -> rank by term ascending
    docs = _docs(spark, ["apple zebra", "filler filler"])
    rows = sorted(
        (r.rank, r.term)
        for r in tf_idf(docs, top_k=2).filter("doc_id = 0").collect()
    )
    assert rows == [(1, "apple"), (2, "zebra")]


def test_tfidf_topk_bound(spark):
    docs = _docs(spark, ["a b c d e f g h"])
    assert tf_idf(docs, top_k=3).count() == 3


def test_repetition_hand_computed(spark):
    docs = _docs(spark, ["a a a b", "x y"])
    got = {r.doc_id: r for r in repetition_signals(docs).collect()}
    r0 = got[0]
    assert r0.n_words == 4
    assert r0.top_word_frac == 0.75
    # bigrams: "a a", "a a", "a b" -> top 2/3, distinct 2 of 3
    assert r0.top_bigram_frac == round(2 / 3, 6)
    assert r0.dup_bigram_frac == round(1 - 2 / 3, 6)
    r1 = got[1]
    assert r1.top_word_frac == 0.5
    assert r1.top_bigram_frac == 1.0 and r1.dup_bigram_frac == 0.0


def test_repetition_null_text_dropped(spark):
    """NULL-text docs must be absent (the SQL oracle's unnest(NULL)
    yields no rows; emitting an all-null Spark row would be a row-count
    divergence)."""
    docs = spark.createDataFrame([(0, "a b"), (1, None)], "doc_id long, text string")
    assert [r.doc_id for r in repetition_signals(docs).collect()] == [0]


def test_repetition_single_word_doc_null_bigrams(spark):
    got = repetition_signals(_docs(spark, ["solo"])).collect()[0]
    assert got.n_words == 1
    assert got.top_word_frac == 1.0
    assert got.top_bigram_frac is None and got.dup_bigram_frac is None


# ---- chunk_overlapping ----------------------------------------------------


def test_chunk_exact_windows(spark):
    from data_wrangling_spark.operators.text_analysis import chunk_overlapping

    words = [f"w{i}" for i in range(10)]
    docs = _docs(spark, [" ".join(words)])
    rows = sorted(
        (r.chunk_id, r.n_words, r.chunk_text)
        for r in chunk_overlapping(docs, size=4, stride=3).collect()
    )
    # starts 0,3,6,9 -> windows [0:4],[3:7],[6:10],[9:10] (short tail)
    assert rows == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w3 w4 w5 w6"),
        (2, 4, "w6 w7 w8 w9"),
        (3, 1, "w9"),
    ]


def test_chunk_every_word_covered_and_overlap(spark):
    from data_wrangling_spark.operators.text_analysis import chunk_overlapping

    words = [f"t{i}" for i in range(50)]
    docs = _docs(spark, [" ".join(words)])
    chunks = chunk_overlapping(docs, size=8, stride=5).collect()
    seen = set()
    for r in chunks:
        seen.update(r.chunk_text.split(" "))
    assert seen == set(words)
    # consecutive full windows share exactly size - stride words
    by_id = {r.chunk_id: r.chunk_text.split(" ") for r in chunks}
    for i in range(len(by_id) - 2):  # skip the short tail pair
        assert by_id[i][-3:] == by_id[i + 1][:3]


def test_chunk_no_overlap_when_stride_equals_size(spark):
    from data_wrangling_spark.operators.text_analysis import chunk_overlapping

    docs = _docs(spark, [" ".join(str(i) for i in range(9))])
    chunks = chunk_overlapping(docs, size=3, stride=3).collect()
    texts = [r.chunk_text for r in sorted(chunks, key=lambda r: r.chunk_id)]
    assert texts == ["0 1 2", "3 4 5", "6 7 8"]


def test_chunk_null_and_blank_dropped(spark):
    from data_wrangling_spark.operators.text_analysis import chunk_overlapping

    docs = spark.createDataFrame(
        [(0, None), (1, "   "), (2, "one two")], "doc_id long, text string"
    )
    rows = chunk_overlapping(docs, size=4, stride=2).collect()
    assert {r.doc_id for r in rows} == {2}


def test_chunk_rejects_bad_stride(spark):
    import pytest

    from data_wrangling_spark.operators.text_analysis import chunk_overlapping

    docs = _docs(spark, ["a b c"])
    with pytest.raises(ValueError):
        chunk_overlapping(docs, size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_overlapping(docs, size=4, stride=0)


# ---- boilerplate_spans ----------------------------------------------------


def test_boilerplate_known_span(spark):
    from data_wrangling_spark.operators.text_analysis import boilerplate_spans

    docs = _docs(
        spark,
        [
            "all rights reserved body one",
            "intro all rights reserved tail",
            "all rights reserved again here",
            "nothing shared in this doc",
        ],
    )
    rows = {r.span: r.n_docs for r in boilerplate_spans(docs, n=3).collect()}
    assert rows["all rights reserved"] == 3
    assert all(v >= 2 for v in rows.values())


def test_boilerplate_counts_docs_not_occurrences(spark):
    from data_wrangling_spark.operators.text_analysis import boilerplate_spans

    # span repeated 3x INSIDE one doc + once in another -> doc freq 2
    docs = _docs(
        spark,
        ["x y z x y z x y z", "x y z other words"],
    )
    rows = {r.span: r.n_docs for r in boilerplate_spans(docs, n=3).collect()}
    assert rows["x y z"] == 2


def test_boilerplate_short_docs_excluded(spark):
    from data_wrangling_spark.operators.text_analysis import boilerplate_spans

    docs = _docs(spark, ["a b", "a b", "c"])
    assert boilerplate_spans(docs, n=3).count() == 0


# ---- chunk_overlapping property: Spark == pure-Python model ---------------


def _py_chunks(text: str, size: int, stride: int):
    toks = text.strip().split()
    if not toks:
        return []
    return [
        (ci, len(toks[s : s + size]), " ".join(toks[s : s + size]))
        for ci, s in enumerate(range(0, len(toks), stride))
    ]


def test_chunk_matches_python_model_on_varied_shapes(spark):
    """Model-based check over a grid of (n_words, size, stride) shapes
    including stride==size, stride==1, size>n_words, and single-token
    docs — the Spark plan must agree with the obvious sequential
    implementation everywhere."""
    from data_wrangling_spark.operators.text_analysis import chunk_overlapping

    cases = []
    doc_id = 0
    texts = {}
    for n_words in (1, 2, 5, 24, 31, 32, 33, 100):
        text = " ".join(f"w{i}" for i in range(n_words))
        texts[doc_id] = text
        cases.append((doc_id, text))
        doc_id += 1
    df = spark.createDataFrame(cases, "doc_id long, text string")
    for size, stride in ((32, 24), (4, 4), (4, 1), (7, 3), (200, 50)):
        got = sorted(
            (r.doc_id, r.chunk_id, r.n_words, r.chunk_text)
            for r in chunk_overlapping(df, size=size, stride=stride).collect()
        )
        want = sorted(
            (d, ci, n, t)
            for d, text in texts.items()
            for ci, n, t in _py_chunks(text, size, stride)
        )
        assert got == want, f"divergence at size={size} stride={stride}"


def test_quality_features_replaces_existing_columns(spark):
    """Review regression: the staged-select rewrite appended duplicate
    columns when the input already carried an output name (the old
    withColumn form replaced in place), so a re-run over its own output
    raised AMBIGUOUS_REFERENCE. Outputs must replace IN PLACE: the
    column ORDER must also be stable across a re-run (advice find —
    sorted() comparison let a drop-then-append reordering through,
    which positional consumers would see as a schema change)."""
    from data_wrangling_spark.operators.text_analysis import quality_features

    docs = _docs(spark, ["the cat sat", "dog dog dog."])
    once = quality_features(docs)
    twice = quality_features(once)
    assert once.columns == twice.columns
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    # clash column in the MIDDLE of the input: must be replaced at its
    # original position (withColumn semantics), not dropped-and-appended
    mid = docs.select(
        F.col("doc_id"), F.lit(-1).alias("n_tokens"), F.col("text")
    )
    got = quality_features(mid)
    assert got.columns[:3] == ["doc_id", "n_tokens", "text"]
    assert got.filter(F.col("n_tokens") < 0).count() == 0


def test_bm25_topk_ranking_and_edges(spark):
    """BM25 basics on a hand corpus: a doc matching more query terms
    with shorter length outranks a longer partial match; docs with no
    query term are absent; unknown terms contribute nothing; empty
    query_terms raises."""
    import pytest

    from data_wrangling_spark.operators.text_analysis import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark table"),                      # both terms, short
            (2, "spark spark spark filler filler filler filler filler"),
            (3, "table"),                            # one term, shortest
            (4, "nothing relevant here"),            # no terms
            (5, None),                               # NULL text dropped
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, query_terms=["spark", "table", "zzz_absent"],
                    top=10).collect()
    ids = [r.doc_id for r in out]
    assert set(ids) == {1, 2, 3}          # doc 4/5 never appear
    assert ids[0] == 1                    # both-term short doc ranks first
    assert [r.rank for r in out] == [1, 2, 3]
    assert all(r.score > 0 for r in out)

    with pytest.raises(ValueError, match="query_terms"):
        bm25_topk(docs, query_terms=[])

    # advisor find, round 12: repeated query terms must collapse to the
    # set semantics (the union-branch rework would otherwise double the
    # repeated term's df AND its score contribution) — scores with
    # duplicates must equal scores without
    base = {r.doc_id: r.score for r in
            bm25_topk(docs, query_terms=["spark", "table"], top=10).collect()}
    duped = {r.doc_id: r.score for r in
             bm25_topk(docs, query_terms=["spark", "table", "spark"],
                       top=10).collect()}
    assert base == duped


def test_lm_score_bigram_hand_computed(spark):
    """Bigram-LM scoring on a corpus small enough to compute by hand.

    Corpus: d1 = "a b a b", d2 = "a b c", d3 = "z" (dropped: < 2
    tokens), d4 = NULL (dropped). Bigram occurrences: d1 -> (a b),
    (b a), (a b); d2 -> (a b), (b c).
    Counts: C(a b)=3, C(b a)=1, C(b c)=1; prefixes C(a)=3, C(b)=2;
    V=3 ({a, b, c}: the vocabulary is built from SURVIVING docs, so
    d3's 'z' contributes nothing — the <2-token filter runs before
    tokenize-for-vocabulary on both engines).
    P(a b) = (3+1)/(3+3) = 2/3;  P(b a) = (1+1)/(2+3) = 2/5;
    P(b c) = (1+1)/(2+3) = 2/5.
    """
    import math

    from data_wrangling_spark.operators.text_analysis import lm_score_bigram

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "z"), (4, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in lm_score_bigram(docs).collect()}
    assert set(rows) == {1, 2}

    nll = {
        "ab": round(-math.log((3 + 1.0) / (3 + 3)) * 1e6),
        "ba": round(-math.log((1 + 1.0) / (2 + 3)) * 1e6),
        "bc": round(-math.log((1 + 1.0) / (2 + 3)) * 1e6),
    }
    d1_sum = 2 * nll["ab"] + nll["ba"]
    d2_sum = nll["ab"] + nll["bc"]
    assert rows[1].n_bigrams == 3 and rows[1].nll_micro_sum == d1_sum
    assert rows[2].n_bigrams == 2 and rows[2].nll_micro_sum == d2_sum
    assert rows[1].avg_nll == round(d1_sum / 3 / 1e6, 6)
    assert rows[2].avg_nll == round(d2_sum / 2 / 1e6, 6)
    # the repeated in-distribution transition scores LOWER (more fluent)
    assert rows[1].avg_nll < rows[2].avg_nll


def test_token_entropy_hand_computed(spark):
    """H = ln(n) - (sum c*ln c)/n in integer micro-nats, computed by
    hand for three tiny documents (uniform, skewed, single-token)."""
    import math

    from data_wrangling_spark.operators.text_analysis import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # uniform: H = ln 4
            (2, "a a a b"),          # skewed: ln 4 - (3 ln 3)/4
            (3, "x x x x"),          # degenerate: H = 0
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in token_entropy(docs).collect()}

    def micro(n, counts):
        s = sum(round(1000000.0 * c * math.log(c)) for c in counts)
        return round(1000000.0 * math.log(n) - float(s) / n)

    assert rows[1].n_tokens == 4 and rows[1].distinct_tokens == 4
    assert rows[1].entropy_micro == micro(4, [1, 1, 1, 1]) == 1386294
    assert rows[2].entropy_micro == micro(4, [3, 1])
    assert rows[3].entropy_micro == 0 and rows[3].distinct_tokens == 1


def test_boilerplate_removal_drops_shared_segment(spark):
    from data_wrangling_spark.operators.text_analysis import boilerplate_removal

    # 2-token segments: "x y" is shared by both docs (df=2, dropped);
    # the rest are unique (kept, original order preserved)
    docs = _docs(spark, ["x y a b c d", "x y p q"])
    got = {r.doc_id: r for r in
           boilerplate_removal(docs, seg_tokens=2, min_docs=2).collect()}
    assert got[0].n_segments == 3 and got[0].n_kept == 2
    assert got[0].cleaned_text == "a b c d"
    assert got[1].n_segments == 2 and got[1].n_kept == 1
    assert got[1].cleaned_text == "p q"


def test_boilerplate_removal_all_boilerplate_keeps_row(spark):
    from data_wrangling_spark.operators.text_analysis import boilerplate_removal

    docs = _docs(spark, ["same text", "same text"])
    got = {r.doc_id: r for r in
           boilerplate_removal(docs, seg_tokens=2, min_docs=2).collect()}
    assert set(got) == {0, 1}
    for r in got.values():
        assert r.n_kept == 0 and r.cleaned_text == ""


def test_boilerplate_removal_within_doc_repeat_not_boilerplate(spark):
    from data_wrangling_spark.operators.text_analysis import boilerplate_removal

    # "r r" appears twice in ONE doc: df counts distinct docs, so both
    # occurrences survive (corpus-level dedup, not intra-doc)
    docs = _docs(spark, ["r r m m r r", "other words here x"])
    got = {r.doc_id: r for r in
           boilerplate_removal(docs, seg_tokens=2, min_docs=2).collect()}
    assert got[0].cleaned_text == "r r m m r r"


def test_boilerplate_removal_ragged_tail_segment(spark):
    from data_wrangling_spark.operators.text_analysis import boilerplate_removal

    docs = _docs(spark, ["a b c d e"])  # 2-token segments -> ragged "e"
    row = boilerplate_removal(docs, seg_tokens=2, min_docs=2).collect()[0]
    assert row.n_segments == 3
    assert row.cleaned_text == "a b c d e"


def test_hashed_linear_score_hand_computed(spark):
    import hashlib

    from data_wrangling_spark.operators.text_analysis import (
        HASH_CLS_BUCKETS,
        HASH_CLS_WEIGHT_MOD,
        HASH_CLS_WEIGHT_MULT,
        hashed_linear_score,
    )

    def w(tok):
        b = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % HASH_CLS_BUCKETS
        return b * HASH_CLS_WEIGHT_MULT % HASH_CLS_WEIGHT_MOD - 1000

    docs = _docs(spark, ["hello world hello"])
    row = hashed_linear_score(docs).collect()[0]
    s = w("hello") * 2 + w("world")
    assert row.n_tokens == 3
    assert row.score_milli == round(1000.0 * s / 3)
    assert row.label == ("keep" if row.score_milli > 0 else "drop")


def test_hashed_linear_score_trained_weights_join(spark):
    from data_wrangling_spark.operators.text_analysis import (
        HASH_CLS_BUCKETS,
        hashed_linear_score,
    )

    # an explicit all-positive model: every token bucket weighs +5
    weights = spark.createDataFrame(
        [(b, 5) for b in range(HASH_CLS_BUCKETS)], "bucket long, weight long"
    )
    docs = _docs(spark, ["any tokens at all"])
    row = hashed_linear_score(docs, weights=weights).collect()[0]
    assert row.score_milli == 5000 and row.label == "keep"


def test_collocations_pmi_hand_computed(spark):
    import math

    from data_wrangling_spark.operators.text_analysis import collocations_pmi

    # one repeated bigram "a b" (5 times, separated so no other bigram
    # reaches min_count): c_ab=5, c_a=5, c_b=5, N=17 tokens,
    # Npairs = 2*4 + 4 = 12 bigram occurrences
    docs = _docs(spark, ["a b x", "a b y", "a b z", "a b w", "a b v w x"])
    rows = collocations_pmi(docs, min_count=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.w1, r.w2, r.c_ab) == ("a", "b", 5)
    n = 17.0
    npairs = 12.0
    want = round(1e6 * math.log((5 / npairs) / ((5 / n) * (5 / n))))
    assert r.pmi_micro == want


def test_collocations_min_count_is_exact_cut(spark):
    from data_wrangling_spark.operators.text_analysis import collocations_pmi

    docs = _docs(spark, ["p q", "p q", "p q", "p q"])  # c_ab = 4 < 5
    assert collocations_pmi(docs, min_count=5).count() == 0
    assert collocations_pmi(docs, min_count=4).count() == 1


def test_boilerplate_removal_corpus_shuffles_are_hash_domain(spark):
    """Round-8 verdict's last perf-weak: the removal form shuffled raw
    8-token segment STRINGS through its corpus-level aggregates and the
    df join (5.9x DuckDB at 100x) while its sibling boilerplate_spans
    worked in the xxhash64 domain (0.8x). The rework keys every
    corpus-level exchange on the 64-bit segment hash; segment strings
    exist only inside their source task and the doc-keyed reassembly.
    Pin that no exchange partitions on a segment string."""
    from data_wrangling_spark.operators.text_analysis import boilerplate_removal

    docs = _docs(spark, ["a b c d", "a b x y", "p q r s"])
    plan = (
        boilerplate_removal(docs, seg_tokens=2, min_docs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "_seg#" not in line, f"string-keyed exchange: {line}"


def test_boilerplate_removal_matches_string_domain_reference(spark):
    """Equivalence net for the hash-domain rework: a driver-side
    string-domain replay (the old semantics, computed in Python) must
    agree exactly — positions, counts, reassembled text."""
    from data_wrangling_spark.operators.text_analysis import boilerplate_removal

    texts = [
        "x y a b c d",          # shares "x y" with doc 1
        "x y p q",
        "r r m m r r",          # within-doc repeat: not boilerplate
        "lone words only here",
        "c d a b",              # "a b"/"c d" shared with doc 0
        "",                     # empty text: still a row
        "   ",                  # whitespace only
    ]
    docs = _docs(spark, texts)
    got = {r.doc_id: r for r in
           boilerplate_removal(docs, seg_tokens=2, min_docs=2).collect()}

    # driver-side replay of the documented semantics
    import re
    def toks(t):
        t = t.strip()
        return re.split(r"\s+", t) if t else [""] if t == "" else []
    # match TX.tokens: split trimmed text on whitespace; empty/ws-only
    # text yields [''] (one empty token) per the engine's tokenizer
    segged = {}
    for i, t in enumerate(texts):
        tk = re.split(r"\s+", t.strip()) if t.strip() else [""]
        n_seg = -(-len(tk) // 2) if tk else 0
        segged[i] = [" ".join(tk[j * 2:j * 2 + 2]) for j in range(n_seg)]
    from collections import Counter
    df_count = Counter()
    for i, segs in segged.items():
        for s in set(segs):
            df_count[s] += 1
    for i, segs in segged.items():
        kept = [s for s in segs if df_count[s] < 2]
        assert got[i].n_segments == len(segs), (i, got[i])
        assert got[i].n_kept == len(kept), (i, got[i], kept)
        assert got[i].cleaned_text == " ".join(kept), (i, got[i], kept)


def test_boilerplate_regex_segmenter_equals_token_array_form(spark):
    """The round-9 regex-native segmenter must produce byte-identical
    segments to the token-array form (transform/sequence/slice/
    array_join) it replaced for speed — including the whitespace edge
    cases where the tokenizer's space-only trim yields empty tokens:
    leading tab (leading '' token shifts every group boundary),
    trailing whitespace (trailing '' token), empty and space-only
    text, and an exact-multiple token count (no empty tail group)."""
    from pyspark.sql import functions as F

    texts = [
        "\tt1 t2 t3 t4 t5 t6 t7 t8 t9",  # leading '' token + 9 real
        "a\tb   c\nd",
        "a b c d e f g h",               # exact multiple of group size
        "x " * 16,                        # trailing space -> '' token
        "trail\t",
        "",
        "   ",
        "x y z",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for seg in (2, 3, 8):
        toks = F.split(F.trim(F.col("text")), r"\s+")
        n_seg = F.ceil(F.size(toks) / F.lit(float(seg))).cast("int")
        old = F.transform(
            F.sequence(F.lit(0), n_seg - 1),
            lambda i: F.array_join(F.slice(toks, i * seg + 1, seg), " "),
        )
        norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
        marked = F.regexp_replace(
            norm, f"((?:[^ ]* ){{{seg - 1}}}[^ ]*) ", "$1\n"
        )
        new = F.split(marked, "\n")
        rows = docs.select("doc_id", old.alias("o"), new.alias("n")).collect()
        for r in rows:
            assert r.o == r.n, (seg, texts[r.doc_id], r.o, r.n)


# ---------------------------------------------------------------------------
# dsir_importance (registered round 10; the sf0.001/sf0.01 oracle rows
# pin the exact values — these tests pin the SEMANTICS)
# ---------------------------------------------------------------------------

def test_dsir_identical_doc_opposite_labels_symmetric(spark):
    """Two identical docs, one target one source: every bucket has
    ct == cs, so every log-ratio is ln(1) = 0 and both weights are 0
    (neither selected)."""
    from data_wrangling_spark.operators.text_analysis import dsir_importance

    df = spark.createDataFrame(
        [(0, "alpha beta gamma", "en"), (1, "alpha beta gamma", "de")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in dsir_importance(
        df, F.col("lang") == "en").collect()}
    assert out[0].is_target and not out[1].is_target
    for r in out.values():
        assert (r.weight_micro, r.avg_micro, bool(r.selected)) == (0, 0, False)
        assert r.n_tokens == 3


def test_dsir_target_vocabulary_scores_positive(spark):
    """A doc made of target-only tokens must score positive (selected),
    a source-only doc negative, regardless of bucket assignment —
    target-only buckets have ct>0, cs=0, so lr > 0 with smoothing as
    long as totals are balanced."""
    from data_wrangling_spark.operators.text_analysis import dsir_importance

    df = spark.createDataFrame(
        [(0, "tgtword tgtword tgtword", "en"),
         (1, "srcword srcword srcword", "de")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in dsir_importance(
        df, F.col("lang") == "en").collect()}
    assert out[0].weight_micro > 0 and bool(out[0].selected)
    assert out[1].weight_micro < 0 and not bool(out[1].selected)


def test_dsir_null_text_zero_tokens_not_selected(spark):
    from data_wrangling_spark.operators.text_analysis import dsir_importance

    df = spark.createDataFrame(
        [(0, None, "en"), (1, "alpha beta", "de")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in dsir_importance(
        df, F.col("lang") == "en").collect()}
    r0 = out[0]
    assert (r0.n_tokens, r0.weight_micro, r0.avg_micro) == (0, 0, None)
    assert not bool(r0.selected)


def test_dsir_weight_is_integer_sum_partition_invariant(spark):
    """Integer micro-nat weights are summation-order-immune: the same
    corpus at 1 and 7 partitions yields identical rows."""
    from data_wrangling_spark.operators.text_analysis import dsir_importance

    rows = [(i, f"tok{i % 5} tok{(i * 3) % 7} shared common words", 
             "en" if i % 3 == 0 else "xx") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = dsir_importance(df.coalesce(1), F.col("lang") == "en").collect()
    b = dsir_importance(df.repartition(7), F.col("lang") == "en").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
