"""Exhaustive DataFrame BM25 top-k (J10 + A1 + K1 in SURVEY.md).

This is the reference's own semantics made distributed: Mantic scans
every document per query and sums per-term partial scores
(src/brain-scorer.ts:168-179, 270-280), then takes a global top-k with
a deterministic tie-break (src/brain-scorer.ts:181-188). Here the scan
is a broadcast join of the (tiny) query-term set against the
(term, doc) tf relation, a per-doc sum, and a rank window — every
stage Catalyst-native and whole-stage-codegen'd. Used as the oracle-
checkable slow path; the fast path is operators/wand.py.

r6 (guide §2.3 — shuffle fewer bytes): when the query set is a Python
list (every entry point), the exploded token stream is pre-filtered to
the query terms with a codegen InSet BEFORE the tf groupBy. The filter
is semantically a no-op — the downstream inner join on the query-term
set restricts to exactly those terms — but it shrinks the build's one
wide shuffle from every token occurrence in the corpus to only the
query terms' occurrences (orders of magnitude at web vocabulary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.bm25 import B, K1
from ..functions.tokenize import tokenize_query

SCORE_DECIMALS = 4  # fp-sum order varies across partitions; rank on rounded score


def query_terms_df(spark: SparkSession, queries: list[tuple[int, str]]) -> DataFrame:
    """(query_id, term) — driver-side tokenization of the query set
    with the SAME tokenizer as the doc side (T2)."""
    import pandas as pd

    rows = [(qid, t) for qid, q in queries for t in tokenize_query(q)]
    pdf = pd.DataFrame(rows, columns=["query_id", "term"])
    return spark.createDataFrame(pdf, "query_id int, term string")


def _all_query_terms(queries: list[tuple[int, str]]) -> list[str]:
    """Sorted distinct terms across the query set (driver-side) — the
    literal InSet pre-filter for the exploded token stream."""
    return sorted({t for _qid, q in queries for t in tokenize_query(q)})


def bm25_scores(
    docs: DataFrame,
    qterms: DataFrame,
    k1: float = K1,
    b: float = B,
    qterm_list: list[str] | None = None,
) -> DataFrame:
    """(query_id, doc_id, score): exhaustive BM25 from a docs table that
    carries `tokens` + `doc_len` (see operators.docs.build_docs).

    qterm_list (optional): the distinct query terms as Python literals.
    When given, the exploded token stream is filtered to them BEFORE
    the tf aggregation — identical results (the qterms join already
    restricts to these terms), but the wide shuffle carries only
    matching occurrences instead of the whole corpus' tokens."""
    toks = docs.select("doc_id", "doc_len", F.explode("tokens").alias("term"))
    if qterm_list is not None:
        toks = toks.filter(F.col("term").isin(qterm_list))
    tf = toks.groupBy("term", "doc_id", "doc_len").agg(F.count(F.lit(1)).alias("tf"))
    # restrict to query terms first (broadcast — query set is tiny),
    # THEN compute df over the restricted relation (df per term is
    # identical either way; doing it post-join avoids a full-vocab agg)
    matched = tf.join(F.broadcast(qterms.select("term").distinct()), "term")
    df_per_term = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("doc_len").alias("avgdl"))
    scored = (
        matched.join(F.broadcast(df_per_term), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)),
        )
        .withColumn(
            "partial",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.col("avgdl"))),
        )
    )
    return scored.groupBy("query_id", "doc_id").agg(F.sum("partial").alias("score"))


def rank_topk(scores: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, doc_id, score, rank): deterministic top-k — rounded
    score desc, doc_id asc (mirrors src/brain-scorer.ts:181-188)."""
    scores = scores.withColumn("score", F.round("score", SCORE_DECIMALS))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    return rank_topk(
        bm25_scores(docs, query_terms_df(spark, queries), k1, b,
                    qterm_list=_all_query_terms(queries)),
        k,
    )


def bm25f_scores(
    docs: DataFrame,
    qterms: DataFrame,
    fields: list[tuple[str, float]],
    k1: float = K1,
    b: float = B,
    qterm_list: list[str] | None = None,
) -> DataFrame:
    """(query_id, doc_id, score): field-weighted BM25F — the opt-in
    scoring mode for "exact title/url match should win" (reference:
    filename/path structural boosts, src/brain-scorer.ts:226-253,
    364-388 — R4). Simple-BM25F form (Robertson & Zaragoza): weighted
    term frequency wtf = Σ_f w_f · tf_f saturates through ONE k1/length
    norm; df is over the union of fields; doc_len/avgdl stay the body
    norm. With fields=[("tokens", 1.0)] this reduces exactly to BM25 —
    the rank-identity path is untouched.

    `fields` = [(token_column, weight), ...]; docs must carry each
    token column plus body `doc_len`. qterm_list pre-filters each
    field's exploded tokens (same no-op-by-construction argument as
    bm25_scores)."""
    parts = []
    for col, w in fields:
        p = docs.select("doc_id", "doc_len", F.explode(col).alias("term"))
        if qterm_list is not None:
            p = p.filter(F.col("term").isin(qterm_list))
        parts.append(
            p.groupBy("term", "doc_id", "doc_len")
            .agg((F.count(F.lit(1)) * F.lit(float(w))).alias("wtf"))
        )
    wtf = parts[0]
    for p in parts[1:]:
        wtf = wtf.unionByName(p)
    wtf = wtf.groupBy("term", "doc_id", "doc_len").agg(F.sum("wtf").alias("wtf"))
    matched = wtf.join(F.broadcast(qterms.select("term").distinct()), "term")
    df_per_term = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("doc_len").alias("avgdl"))
    scored = (
        matched.join(F.broadcast(df_per_term), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)),
        )
        .withColumn(
            "partial",
            F.col("idf")
            * F.col("wtf")
            * F.lit(k1 + 1.0)
            / (F.col("wtf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.col("avgdl"))),
        )
    )
    return scored.groupBy("query_id", "doc_id").agg(F.sum("partial").alias("score"))


def bm25f_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    fields: list[tuple[str, float]],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    return rank_topk(
        bm25f_scores(docs, query_terms_df(spark, queries), fields, k1, b,
                     qterm_list=_all_query_terms(queries)),
        k,
    )


def tiered_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    tier_fields: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(query_id, doc_id, tier, score, rank): R1 exact-match tiers as an
    OPT-IN ranking mode (reference: the tier ladder that puts exact
    filename matches above path matches above content scores,
    src/brain-scorer.ts:226-253 — "exact title match wins"). tier i =
    the doc's i-th tier field (a token-array column, e.g. url tokens,
    then a title window) contains ALL query terms; docs matching no
    tier field rank in the final tier. Within a tier, BM25 order; the
    BM25 rank-identity path is untouched (this is a separate mode).

    Catalyst containment check: size(array_except(qterms, field)) == 0
    — JVM-side, no UDF; the tier column costs one projection.

    NOT a serving path: the tier assignment is a full-corpus pass per
    query batch (the reference scans everything per query too). It is
    an analytics/batch-rerank mode; a latency-bound deployment would
    materialize a title-window posting index (the same build keyed on
    slice(tokens, 1, W)) and intersect it query-side, exactly like the
    body index — the tier SEMANTICS here are the contract either way."""
    qterms = query_terms_df(spark, queries)
    scores = bm25_scores(docs, qterms, k1, b, qterm_list=_all_query_terms(queries))
    qsets = (
        qterms.groupBy("query_id").agg(F.array_sort(F.collect_set("term")).alias("qset"))
    )
    # tier assignment runs over ALL docs (broadcast query sets, one
    # JVM pass) and FULL-OUTER-joins the BM25 scores: a doc whose tier
    # field contains every query term surfaces even when its body
    # tokens match none (score 0) — e.g. url-only matches — and docs
    # matching no tier field land in the final tier with their score
    fields_df = docs.select(
        "doc_id", *[F.col(c).alias(f"_tier{i}") for i, c in enumerate(tier_fields)]
    )
    tiers_all = fields_df.crossJoin(F.broadcast(qsets))
    tier = F.lit(len(tier_fields))
    for i in range(len(tier_fields) - 1, -1, -1):
        tier = F.when(
            F.size(F.array_except(F.col("qset"), F.col(f"_tier{i}"))) == 0, F.lit(i)
        ).otherwise(tier)
    matched = (
        tiers_all.withColumn("tier", tier)
        .filter(F.col("tier") < len(tier_fields))
        .select("query_id", "doc_id", "tier")
    )
    tiered = (
        scores.join(matched, ["query_id", "doc_id"], "full_outer")
        .withColumn("tier", F.coalesce(F.col("tier"), F.lit(len(tier_fields))))
        .withColumn("score", F.round(F.coalesce(F.col("score"), F.lit(0.0)), SCORE_DECIMALS))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("tier"), F.desc("score"), F.asc("doc_id")
    )
    return (
        tiered.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "tier", "score", "rank")
    )
