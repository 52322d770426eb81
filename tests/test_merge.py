"""Merge test (SURVEY.md §5.2 #6): build per-partition segments, merge,
query results identical to the unmerged index."""

from pyspark.sql import functions as F

from mantic_sh_spark.operators.index_build import build_index
from mantic_sh_spark.operators.merge import merge_segments
from mantic_sh_spark.operators.wand import wand_topk
from mantic_sh_spark.sources.synth import SynthConfig, gen_pages, gen_queries


def _collect(df):
    return sorted((r.query_id, r.rank, r.doc_id, round(r.score, 4)) for r in df.collect())


def test_merge_preserves_results(spark, tmp_path):
    cfg = SynthConfig(n_docs=300, vocab_size=400, seed=7)
    pages = gen_pages(spark, cfg, partitions=3)
    idx = str(tmp_path / "idx")
    build_index(spark, pages, idx, n_segments=4)
    queries = gen_queries(cfg, n_queries=12)

    before = _collect(wand_topk(spark, idx, queries, k=10))

    dst = merge_segments(spark, idx, [0, 1], compact=True)
    segs = [r.segment_id for r in spark.read.parquet(f"{idx}/postings").select("segment_id").distinct().collect()]
    assert sorted(segs) == sorted({dst, 2, 3})

    after = _collect(wand_topk(spark, idx, queries, k=10))
    assert before == after

    # compaction: no undersized blocks except the final block per term
    p = spark.read.parquet(f"{idx}/postings").filter(F.col("segment_id") == dst)
    from pyspark.sql import Window

    w = Window.partitionBy("term").orderBy(F.desc("first_doc"))
    ragged = (
        p.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 1) & (F.col("n") < 128))
        .count()
    )
    assert ragged == 0


def test_compaction_defragments_and_preserves_results(spark, tmp_path):
    """Build with tiny chunks (many ragged tail blocks), merge-with-
    compact into one segment: block count must drop (defragmentation),
    and WAND results must stay rank-identical to the exhaustive engine."""
    from pyspark.sql import functions as F

    from mantic_sh_spark.functions.tokenize import tokens_col
    from mantic_sh_spark.operators.index_build import build_index
    from mantic_sh_spark.operators.merge import merge_segments
    from mantic_sh_spark.operators.query import bm25_topk
    from mantic_sh_spark.operators.wand import wand_topk
    from mantic_sh_spark.sources.synth import SynthConfig, gen_pages, gen_queries

    cfg = SynthConfig(n_docs=400, vocab_size=300, seed=19)
    pages = gen_pages(spark, cfg, partitions=3)
    idx = str(tmp_path / "idx")
    build_index(spark, pages, idx, n_segments=3, chunk_size=32, block_size=16)

    before = spark.read.parquet(f"{idx}/postings").count()
    dst = merge_segments(spark, idx, [0, 1, 2], dst_segment=7, compact=True)
    assert dst == 7
    after_df = spark.read.parquet(f"{idx}/postings")
    after = after_df.count()
    assert after < before, f"compaction should shrink block count ({before} -> {after})"
    # every non-final block of a term should be full (16): at most one
    # ragged block per (term, partition boundary)
    ragged = after_df.filter(F.col("n") < 16).groupBy("term").count().filter("count > 2").count()
    assert ragged == 0

    queries = gen_queries(cfg, n_queries=12)
    rw = wand_topk(spark, idx, queries, k=8).orderBy("query_id", "rank").collect()
    docs = spark.read.parquet(f"{idx}/docs").withColumn("tokens", tokens_col("text"))
    rx = bm25_topk(spark, docs, queries, k=8).orderBy("query_id", "rank").collect()
    assert [(r.query_id, r.doc_id, r.score) for r in rw] == [
        (r.query_id, r.doc_id, r.score) for r in rx
    ]
