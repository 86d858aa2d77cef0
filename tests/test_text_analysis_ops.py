"""tf_idf and repetition_signals unit semantics on constructed corpora
(the registry oracle tests pin them against DuckDB at sf0.001; these pin
the hand-checkable cases)."""

from __future__ import annotations

import math

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
