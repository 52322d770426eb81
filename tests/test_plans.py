"""Plan-quality assertions: pushdown, pruning, broadcast — the scale
guarantees (SURVEY.md §4) checked on the actual physical plans."""

from pyspark.sql import functions as F

from mantic_sh_spark.functions.tokenize import tokens_col
from mantic_sh_spark.operators.query import bm25_scores, query_terms_df
from mantic_sh_spark.plans.explain import (
    explain_str,
    has_broadcast_join,
    has_pushed_filter,
    read_schema_columns,
)

SF = "/root/testdata/sf0.001"


def test_term_filter_pushes_down_to_postings_scan(spark, small_corpus):
    # postings are keyed by the dictionary-encoded int64 tid; resolve the
    # query terms through the terms directory exactly like wand_topk does
    from mantic_sh_spark.operators.wand import _term_meta
    from mantic_sh_spark.sources.catalog import IndexPaths

    meta = _term_meta(spark, IndexPaths(small_corpus["index_dir"]), ["w1x", "w2x"])
    tids = [m[1] for m in meta.values() if m[0] > 0]
    assert len(tids) == 2
    blocks = spark.read.parquet(f"{small_corpus['index_dir']}/postings").filter(
        F.col("tid").isin(tids)
    )
    assert has_pushed_filter(blocks, "tid"), explain_str(blocks)[:2000]


def test_docs_scan_prunes_columns(spark, small_corpus):
    docs = spark.read.parquet(f"{small_corpus['index_dir']}/docs").select("doc_id", "doc_len")
    cols = read_schema_columns(docs)
    assert "text" not in cols and "url" not in cols, cols


def test_query_term_join_is_broadcast(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .withColumn("tokens", tokens_col("text", camel=False))
        .withColumn("doc_len", F.size("tokens"))
    )
    qt = query_terms_df(spark, [(0, "spark join window")])
    scored = bm25_scores(docs, qt)
    assert has_broadcast_join(scored), explain_str(scored)[:3000]


def test_segment_partition_pruning(spark, small_corpus):
    one_seg = spark.read.parquet(f"{small_corpus['index_dir']}/postings").filter(
        F.col("segment_id") == 1
    )
    plan = explain_str(one_seg)
    # partition filter must appear as PartitionFilters, not a post-scan Filter
    assert "PartitionFilters" in plan and "segment_id" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides bucketed by doc_id at write time → the join must plan
    with ZERO shuffles (no Exchange) — the co-located-join guarantee
    the docs ⋈ priors pattern relies on at scale."""
    from pyspark.sql import functions as F

    from mantic_sh_spark.plans.explain import explain_str
    from mantic_sh_spark.sources.bucketing import colocated_join, write_bucketed

    base = spark.range(2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("x")
    )
    side = spark.range(2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13).cast("double").alias("prior")
    )
    import shutil

    spark.sql("DROP TABLE IF EXISTS bkt_docs")
    spark.sql("DROP TABLE IF EXISTS bkt_priors")
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    shutil.rmtree(f"{wh}/bkt_docs", ignore_errors=True)
    shutil.rmtree(f"{wh}/bkt_priors", ignore_errors=True)
    write_bucketed(base, "bkt_docs", n_buckets=8)
    write_bucketed(side, "bkt_priors", n_buckets=8)

    joined = colocated_join(spark, "bkt_docs", "bkt_priors")
    plan = explain_str(joined, "simple")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan
    assert joined.count() == 2000
    # sanity: the same merge join over plain (unbucketed) data DOES shuffle
    plain = base.hint("merge").join(side, "doc_id")
    assert "Exchange hashpartitioning" in explain_str(plain, "simple")
