"""Randomized rank-identity campaign across adversarial index layouts
(tiny blocks, tiny salt chunks, 1-5 segments, optional compacting
merges): the distributed engine (wand_topk — cost-routed TAAT/WAND)
must equal exhaustive BM25, and the serving reader (serve.IndexReader,
no Spark on the query path) must equal the distributed engine.

Odd-seeded cases additionally build POSITIONALLY and fuzz the phrase
engine (incl. stop-term phrases — the batched keyed-searchsorted
verifier's worst case — and random slop) against an INDEPENDENT
per-doc greedy oracle in pure Python, plus reader↔engine identity.
Usage: python tools/fuzz_wand.py"""

import bisect
import shutil
import sys

sys.path.insert(0, ".")
from mantic_sh_spark.session import get_spark
from mantic_sh_spark.functions.tokenize import tokens_col
from mantic_sh_spark.operators.index_build import build_index
from mantic_sh_spark.operators.merge import merge_segments
from mantic_sh_spark.functions.tokenize import tokenize
from mantic_sh_spark.operators.phrase import phrase_topk
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
    phrase_ok = True
    if seed % 2 == 1:
        # positional build on the same corpus/layout; fuzz phrase+slop
        posidx = f"{idx}_pos"
        shutil.rmtree(posidx, ignore_errors=True)
        build_index(spark, pages, posidx, n_segments=nseg, chunk_size=cs,
                    block_size=bs, store_positions=True)
        doc_toks = {
            r.doc_id: tokenize(r.text)
            for r in spark.read.parquet(f"{posidx}/docs").select("doc_id", "text").collect()
        }

        def brute_starts(tokens, terms, slop=0):
            # independent greedy oracle: for each start of terms[0], take
            # the smallest next position per term; valid if stretch<=slop.
            # Returns the valid match-START positions (count = len).
            pos = {t: [i for i, x in enumerate(tokens) if x == t] for t in set(terms)}
            if any(not pos[t] for t in terms):
                return []
            out = []
            for p0 in pos[terms[0]]:
                prev, good = p0, True
                for t in terms[1:]:
                    lst = pos[t]
                    j = bisect.bisect_right(lst, prev)
                    if j >= len(lst):
                        good = False
                        break
                    prev = lst[j]
                if good and (prev - p0 - (len(terms) - 1)) <= slop:
                    out.append(p0)
            return out

        def brute(tokens, terms, slop):
            return len(brute_starts(tokens, terms, slop))

        st = cfg.stop_term
        phrases = [(0, f"{st} w1x", 0), (1, f"{st} {st}", 0), (2, "w2x w3x", 0),
                   (3, f"w1x {st} w4x", seed % 3), (4, f"{st} w5x", 2), (5, "w7x", 0)]
        preader = IndexReader(posidx)
        for qid, ph, slop in phrases:
            terms = tokenize(ph)
            want = {d: brute(toks, terms, slop) for d, toks in doc_toks.items()}
            want = {d: n for d, n in want.items() if n > 0}
            got_rows = phrase_topk(spark, posidx, [(qid, ph)], k=10**6, slop=slop).collect()
            got = {r.doc_id: r.n_matches for r in got_rows}
            if got != want:
                phrase_ok = False
            sgot = dict(preader.phrase_topk(ph, k=10**6, slop=slop))
            if sgot != want:
                phrase_ok = False
        # find_references serving kernel vs the start-position oracle
        # (single-term, multi-term, and stop-term symbols)
        for sym in (f"{st} w1x", "w2x w3x", "w7x"):
            terms = tokenize(sym)
            rwant = {d: brute_starts(toks, terms) for d, toks in doc_toks.items()}
            rwant = {d: v for d, v in rwant.items() if v}
            rgot = {r["doc_id"]: r["positions"]
                    for r in preader.references(sym, k=10**6, max_positions=10**6)}
            if rgot != rwant:
                phrase_ok = False
        shutil.rmtree(posidx, ignore_errors=True)
    fails += not (ok and serve_ok and phrase_ok)
    print(f"seed={seed} bs={bs} cs={cs} nseg={nseg} vocab={vocab} merge={do_merge}: "
          f"{'OK' if ok else 'MISMATCH'} serve={'OK' if serve_ok else 'MISMATCH'}"
          f" phrase={'OK' if phrase_ok else 'MISMATCH'}", flush=True)
    shutil.rmtree(idx, ignore_errors=True)
print("FAILS:", fails)
spark.stop()
