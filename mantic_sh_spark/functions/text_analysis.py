"""Text-analysis operators for training-data pipelines: token stats,
quality scoring, language ID, fingerprinting.

Reference analogs: token estimation (src/process-request.ts:26-27,
src/file-metadata.ts:25-30 — T10), file-type / quality classification
(src/file-classifier.ts:86-130 — P5, score threshold P7), keyword
stats (src/parser.ts:314-369). All pure Catalyst expressions — these
run at 100 TB without a Python worker in sight.

Every function takes a documents-shaped DataFrame (doc_id, text, …)
and returns columns that mirror the DuckDB oracle SQL in
plans/entry_queries.py one-for-one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .tokenize import tokens_col

# fixed stopword list — shared verbatim with the SQL oracles
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]


def _toks(text: str = "text") -> Column:
    return tokens_col(text, camel=False)


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, n_chars_seen) — T10 made exact."""
    t = docs.withColumn("toks", _toks())
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.length("text").cast("long").alias("n_chars_seen"),
    )


def stopword_ratio_col(toks: Column) -> Column:
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, quality): 0.4·min(1, n_tokens/100) + 0.3·stopword_ratio
    + 0.3·distinct_ratio — the P7/R-series additive-prior shape.

    The score is a RATIONAL (all inputs are token counts), so the
    4-decimal rounding happens in exact int64 space:
      quality = ((20000·num + den) DIV (2·den)) / 10000
    with num = 4·min(n,100)·n + 300·(n_stop + n_dist), den = 1000·n —
    half-up on the exact value. Summing three rounded doubles and then
    rounding (the naive form) differs between engines by 1 ulp at
    half-boundaries; one row at sf0.1 hit exactly that (0.2327 vs
    0.2328 against the DuckDB twin). Integer rounding is
    engine-independent by construction."""
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    t = docs.withColumn("toks", _toks())
    n = F.size("toks")
    n_stop = F.size(F.filter(F.col("toks"), lambda x: F.array_contains(sw, x)))
    n_dist = F.size(F.array_distinct("toks"))
    staged = t.select(
        "doc_id",
        n.alias("_n"),
        (F.lit(4) * F.least(n, F.lit(100)) * n + F.lit(300) * (n_stop + n_dist))
        .cast("long").alias("_num"),
        (F.lit(1000) * n).cast("long").alias("_den"),
    )
    q = F.when(
        F.col("_n") > 0,
        F.expr("(20000 * _num + _den) DIV (2 * _den)") / F.lit(10000.0),
    ).otherwise(F.lit(0.0))
    return staged.select("doc_id", q.alias("quality"))


def quality_filter(docs: DataFrame, min_tokens: int = 20, max_tokens: int = 100000,
                   min_mean_word_len: float = 2.0, max_mean_word_len: float = 12.0,
                   min_distinct_ratio: float = 0.1,
                   min_stopword_ratio: float = 0.0) -> DataFrame:
    """(doc_id, n_tokens, mean_word_len, distinct_ratio, stopword_ratio,
    keep): Gopher-style quality FILTER rules for training-data curation
    — hard bounds on length, mean word length, lexical diversity, and
    stopword presence, each a pure Catalyst expression over the token
    array. `keep` is the conjunction; callers filter or audit the
    per-rule columns. (The scoring twin is quality_score; these are the
    reject rules a 100 TB pre-training pipeline applies first.)"""
    t = docs.withColumn("toks", _toks())
    n = F.size("toks")
    mean_wl = F.when(n > 0,
                     F.aggregate("toks", F.lit(0), lambda a, x: a + F.length(x)) / n
                     ).otherwise(F.lit(0.0))
    dist = F.when(n > 0, F.size(F.array_distinct("toks")) / n).otherwise(F.lit(0.0))
    stop = stopword_ratio_col(F.col("toks"))
    keep = (
        (n >= min_tokens) & (n <= max_tokens)
        & (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
        & (dist >= min_distinct_ratio) & (stop >= min_stopword_ratio)
    )
    return t.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(dist, 4).alias("distinct_ratio"),
        F.round(stop, 4).alias("stopword_ratio"),
        keep.alias("keep"),
    )


def lang_id(docs: DataFrame, threshold: float = 0.03) -> DataFrame:
    """(doc_id, pred_lang): crude stopword-hit heuristic — 'en' when the
    English stopword ratio clears the threshold. (A real n-gram model
    plugs into the same shape; the Spark plumbing is the point.)"""
    t = docs.withColumn("toks", _toks())
    pred = F.when(stopword_ratio_col(F.col("toks")) >= threshold, F.lit("en")).otherwise(F.lit("other"))
    return t.select("doc_id", pred.alias("pred_lang"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): md5 content fingerprint (doc-identity analog of the
    cache's mtime+size change detection, src/cache.ts:147-186)."""
    return docs.select("doc_id", F.md5("text").alias("fp"))


def rolling_fingerprints(docs: DataFrame, window: int = 8) -> DataFrame:
    """(doc_id, pos, rfp): rolling window fingerprints over the token
    stream — the winnowing-style primitive for near-dup detection.
    Catalyst-only: sequence + transform + explode."""
    t = docs.withColumn("toks", _toks())
    t = t.filter(F.size("toks") >= window)
    idx = F.sequence(F.lit(0), F.size("toks") - F.lit(window))
    grams = F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i + 1, window))))
    return t.select("doc_id", F.posexplode(grams).alias("pos", "rfp"))
