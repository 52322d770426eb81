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
    + 0.3·distinct_ratio — the P7/R-series additive-prior shape."""
    t = docs.withColumn("toks", _toks())
    n = F.size("toks")
    q = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(100.0))
        + F.lit(0.3) * stopword_ratio_col(F.col("toks"))
        + F.lit(0.3) * F.when(n > 0, F.size(F.array_distinct("toks")) / n).otherwise(F.lit(0.0))
    )
    return t.select("doc_id", F.round(q, 4).alias("quality"))


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
