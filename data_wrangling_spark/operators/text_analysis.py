"""Text-analysis operators over document tables (SURVEY.md §2.11 X-TEXT).

Language ID, quality scoring, token statistics, fingerprinting — each a
thin DataFrame transformation over the pure Column expressions in
functions/text.py. Everything stays JVM-side (whole-stage codegen); the
per-document cost is O(tokens) with no shuffle at all — these are narrow
ops safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_wrangling_spark.functions import text as TX


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/marker-word language heuristic: score each candidate
    language by distinct marker-word hits; argmax with a fixed priority
    order for ties (deterministic)."""
    langs = list(TX.LANG_MARKERS)
    scores = {lang: TX.lang_score(text_col, lang) for lang in langs}
    best: Column = F.lit(langs[-1])
    # fixed priority: earlier langs win ties (iterate reversed)
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        best = F.when(cond, F.lit(lang)).otherwise(best)
    # NULL text → NULL prediction: without the guard every tie condition
    # is NULL, all when() branches fall through, and null documents get
    # silently labeled as the init-default language
    best = F.when(F.col(text_col).isNull(), F.lit(None).cast("string")).otherwise(best)
    return df.withColumn("lang_pred", best)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality signals. The score formula
    is fixed (documented) so the DuckDB oracle can reproduce it exactly:
    stopword_ratio * 0.5 + min(n_tokens, 100) / 100.0 * 0.3 +
    (1 - punct_ratio) * 0.2, all double math in a fixed op order."""
    n_tok = TX.token_count(text_col).cast("double")
    n_stop = TX.stopword_count(text_col).cast("double")
    n_punct = TX.punct_count(text_col).cast("double")
    stop_ratio = n_stop / n_tok
    punct_ratio = n_punct / n_tok
    score = (
        stop_ratio * F.lit(0.5)
        + F.least(n_tok, F.lit(100.0)) / F.lit(100.0) * F.lit(0.3)
        + (F.lit(1.0) - punct_ratio) * F.lit(0.2)
    )
    return (
        df.withColumn("n_tokens", TX.token_count(text_col))
        .withColumn("n_chars_computed", TX.char_count(text_col))
        .withColumn("n_punct", TX.punct_count(text_col))
        .withColumn("n_stopwords", TX.stopword_count(text_col))
        .withColumn("quality_score", score)
    )


def fingerprint_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable md5-of-normalized-text fingerprint per document."""
    return df.withColumn("fingerprint", TX.fingerprint(text_col))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level token statistics: one explode + one hash aggregate
    (partial agg map-side; shuffle is vocabulary-sized)."""
    toks = df.select(F.explode(TX.tokens(text_col)).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "token")
    )
