"""Randomized rank-identity campaign across adversarial index layouts
(tiny blocks, tiny salt chunks, 1-5 segments, optional compacting
merges): the distributed engine (wand_topk — cost-routed TAAT/WAND)
must equal exhaustive BM25, and the serving reader (serve.IndexReader,
no Spark on the query path) must equal the distributed engine.
Usage: python tools/fuzz_wand.py"""

import shutil
import sys

sys.path.insert(0, ".")
from mantic_sh_spark.session import get_spark
from mantic_sh_spark.functions.tokenize import tokens_col
from mantic_sh_spark.operators.index_build import build_index
from mantic_sh_spark.operators.merge import merge_segments
from mantic_sh_spark.operators.query import bm25_topk
from mantic_sh_spark.operators.wand import wand_topk
from mantic_sh_spark.serve import IndexReader
from mantic_sh_spark.sources.synth import SynthConfig, gen_pages, gen_queries

spark = get_spark(cores=8)
fails = 0
cases = [(101+i, [2,3,5,7,11,13][i%6], [16,24,48,96][i%4], (i%5)+1, [60,200,700,1500][i%4], i%2==0)
         for i in range(12)]
for seed, bs, cs, nseg, vocab, do_merge in cases:
    cfg = SynthConfig(n_docs=350, vocab_size=vocab, seed=seed)
    pages = gen_pages(spark, cfg, partitions=3)
    idx = f"/tmp/fuzz2_{seed}"
    shutil.rmtree(idx, ignore_errors=True)
    build_index(spark, pages, idx, n_segments=nseg, chunk_size=cs, block_size=bs)
    if do_merge and nseg > 1:
        merge_segments(spark, idx, list(range(nseg)), dst_segment=nseg+3, compact=True)
    queries = gen_queries(cfg, n_queries=20)
    rw = wand_topk(spark, idx, queries, k=8).orderBy("query_id", "rank").collect()
    docs = spark.read.parquet(f"{idx}/docs").withColumn("tokens", tokens_col("text"))
    rx = bm25_topk(spark, docs, queries, k=8).orderBy("query_id", "rank").collect()
    ok = [(r.query_id, r.doc_id, r.score) for r in rw] == [(r.query_id, r.doc_id, r.score) for r in rx]
    # serving-path identity on the same layout
    reader = IndexReader(idx)
    wand_by_q = {}
    for r in rw:
        wand_by_q.setdefault(r.query_id, []).append((r.doc_id, round(r.score, 4)))
    serve_ok = all(
        [(d, round(s, 4)) for d, s in reader.topk(q, k=8)] == wand_by_q.get(qid, [])
        for qid, q in queries
    )
    fails += not (ok and serve_ok)
    print(f"seed={seed} bs={bs} cs={cs} nseg={nseg} vocab={vocab} merge={do_merge}: "
          f"{'OK' if ok else 'MISMATCH'} serve={'OK' if serve_ok else 'MISMATCH'}", flush=True)
    shutil.rmtree(idx, ignore_errors=True)
print("FAILS:", fails)
spark.stop()
