"""Incremental maintenance (ST2): extend an index with new pages; WAND
must stay rank-identical to the exhaustive engine over the COMBINED
corpus even though old segments' block maxima were built at the old
avgdl (bound-inflation path)."""

from dataclasses import replace

from pyspark.sql import functions as F

from mantic_sh_spark.functions.tokenize import tokens_col
from mantic_sh_spark.operators.index_build import build_index
from mantic_sh_spark.operators.query import bm25_topk
from mantic_sh_spark.operators.wand import wand_topk
from mantic_sh_spark.sources.synth import SynthConfig, gen_pages, gen_queries
from mantic_sh_spark.streaming.incremental import extend_index


def _collect(df):
    return sorted((r.query_id, r.rank, r.doc_id, round(r.score, 4)) for r in df.collect())


def test_extend_then_query(spark, tmp_path):
    cfg = SynthConfig(n_docs=250, vocab_size=400, seed=21, len_mu=4.2)
    pages = gen_pages(spark, cfg, partitions=3)
    idx = str(tmp_path / "idx")
    build_index(spark, pages, idx, n_segments=3)

    # new batch with LONGER docs → global avgdl drifts UP (the regime
    # where stale block maxima would under-bound without inflation)
    cfg2 = replace(cfg, seed=22, len_mu=5.2, needle_every=0)
    new_pages = gen_pages(spark, cfg2, partitions=2).withColumn(
        "url", F.regexp_replace("url", "example/", "example/new/")
    )
    segs = extend_index(spark, idx, new_pages, n_new_segments=2)
    assert min(segs) >= 3

    docs = spark.read.parquet(f"{idx}/docs").withColumn("tokens", tokens_col("text"))
    assert docs.count() == 500

    queries = gen_queries(cfg, n_queries=16)
    ex = _collect(bm25_topk(spark, docs, queries, k=10))
    wd = _collect(wand_topk(spark, idx, queries, k=10))
    assert ex == wd

    # results include docs from both generations
    new_docs = {r.doc_id for r in spark.read.parquet(f"{idx}/docs").filter(F.col("segment_id") >= 3).select("doc_id").collect()}
    hit_docs = {d for (_, _, d, _) in wd}
    assert hit_docs & new_docs, "extended docs must be retrievable"


def test_stream_index(spark, tmp_path):
    """availableNow streaming fold over a directory of page files."""
    cfg = SynthConfig(n_docs=120, vocab_size=300, seed=31)
    pages_dir = str(tmp_path / "pages_stream")
    gen_pages(spark, cfg, partitions=2).write.parquet(pages_dir)
    idx = str(tmp_path / "idx_s")
    # bootstrap with a tiny base index so extend has something to fold into
    base = gen_pages(spark, replace(cfg, seed=32, n_docs=40), partitions=1).withColumn(
        "url", F.regexp_replace("url", "example/", "example/base/")
    )
    build_index(spark, base, idx, n_segments=2)

    q = __import__("mantic_sh_spark.streaming.incremental", fromlist=["stream_index"]).stream_index(
        spark, pages_dir, idx, str(tmp_path / "ckpt"), n_new_segments=2
    )
    q.awaitTermination(120)
    docs = spark.read.parquet(f"{idx}/docs")
    assert docs.count() == 160
    res = wand_topk(spark, idx, [(0, "w0x")], k=5)
    assert res.count() == 5


def test_extend_positional_index_keeps_positions(spark, tmp_path):
    """Extending a positional index must append POSITIONAL postings
    (store_positions auto-detected from the committed schema) — phrase
    queries over docs in the NEW segments would otherwise crash or
    silently miss (ADVICE r1, high)."""
    from mantic_sh_spark.functions.tokenize import tokenize
    from mantic_sh_spark.operators.phrase import phrase_topk

    cfg = SynthConfig(n_docs=200, vocab_size=120, seed=47)
    pages = gen_pages(spark, cfg, partitions=2)
    idx = str(tmp_path / "posidx")
    build_index(spark, pages, idx, n_segments=2, chunk_size=64, block_size=32,
                store_positions=True)

    cfg2 = replace(cfg, seed=48, needle_every=0)
    new_pages = gen_pages(spark, cfg2, partitions=2).withColumn(
        "url", F.regexp_replace("url", "example/", "example/new/")
    )
    segs = extend_index(spark, idx, new_pages, n_new_segments=2)

    # new segments carry non-null positions bytes
    new_posts = spark.read.parquet(f"{idx}/postings").filter(F.col("segment_id").isin(segs))
    assert "positions" in new_posts.columns
    assert new_posts.filter(F.col("positions").isNull()).count() == 0

    # phrase results over the combined corpus equal a token-scan oracle
    phrase = "w0x w1x"
    res = {(r.doc_id, r.n_matches) for r in phrase_topk(spark, idx, [(0, phrase)], k=100000).collect()}
    terms = tokenize(phrase)
    oracle = set()
    for r in spark.read.parquet(f"{idx}/docs").select("doc_id", "text").collect():
        toks = tokenize(r.text)
        n = sum(1 for i in range(len(toks) - 1) if toks[i : i + 2] == terms)
        if n:
            oracle.add((r.doc_id, n))
    assert res == oracle and oracle, "phrase must match oracle over old AND new segments"
    new_doc_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{idx}/docs").filter(F.col("segment_id").isin(segs)).select("doc_id").collect()
    }
    assert {d for d, _ in oracle} & new_doc_ids, "oracle must cover new-segment docs"
