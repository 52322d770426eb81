"""Crash-recovery-at-scale probe: what does healing a crashed
compaction COST on the bench corpus, and do readers stay correct in
the crash window?

Builds the bench-scale corpus (400k docs / 32 segments by default),
tombstones ~5% of docs, then runs a purge-compaction of the 16 smallest
segments crashed at both protocol barriers:

  * pre-barrier (at the 'committed' manifest append): the fold's dst
    dirs exist but must not serve. Measures (a) reader-gating proof —
    a fresh distributed query and a fresh IndexReader return the exact
    pre-fold answers with NO gc — and (b) the ROLLBACK cost of
    gc_aborted_merges (delete dst dirs + one manifest append:
    metadata-bounded, independent of index size).
  * post-barrier (crash before _finish_merge): dst is live, sources
    pending retirement. Measures the ROLL-FORWARD cost (retire + purge
    — the work the merge was already going to do, proportional to the
    fold, never the index).

Prints one JSON line; save to bench_runs/ for BASELINE.md traceability.

Usage: python tools/probe_crash_scale.py [--n-docs 400000] [--segments 32]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from mantic_sh_spark.operators import merge as merge_mod
from mantic_sh_spark.operators.delete import delete_docs
from mantic_sh_spark.operators.index_build import build_index
from mantic_sh_spark.operators.merge import gc_aborted_merges, merge_segments
from mantic_sh_spark.operators.wand import refresh_meta, wand_topk
from mantic_sh_spark.serve import IndexReader
from mantic_sh_spark.session import get_spark
from mantic_sh_spark.sources.catalog import IndexPaths
from mantic_sh_spark.sources.synth import SynthConfig, gen_pages, gen_queries

IDX = "/tmp/probe_crash_scale_idx"


class _Boom(RuntimeError):
    pass


def _crash_at_committed(spark, idx, srcs, dst):
    """Run the merge, injected to die at the 'committed' append."""
    calls = {"n": 0}
    real = merge_mod.append_manifest

    def crashing(s, p, rows):
        calls["n"] += 1
        if calls["n"] == 2:
            raise _Boom("pre-barrier crash")
        return real(s, p, rows)

    merge_mod.append_manifest = crashing
    try:
        merge_segments(spark, idx, srcs, dst_segment=dst, purge=True)
        raise AssertionError("injection never fired")
    except _Boom:
        pass
    finally:
        merge_mod.append_manifest = real


def _crash_at_finish(spark, idx, srcs, dst):
    """Run the merge, injected to die right AFTER the barrier."""
    real = merge_mod._finish_merge

    def boom(*a, **kw):
        raise _Boom("post-barrier crash")

    merge_mod._finish_merge = boom
    try:
        merge_segments(spark, idx, srcs, dst_segment=dst, purge=True)
        raise AssertionError("injection never fired")
    except _Boom:
        pass
    finally:
        merge_mod._finish_merge = real


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=400_000)
    ap.add_argument("--segments", type=int, default=32)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark(cores=args.cores)
    out: dict = {"n_docs": args.n_docs, "segments": args.segments,
                 "cores": args.cores}

    cfg = SynthConfig(n_docs=args.n_docs, vocab_size=20_000, seed=11)
    pages = gen_pages(spark, cfg, partitions=args.cores * 2)
    shutil.rmtree(IDX, ignore_errors=True)
    t0 = time.time()
    build_index(spark, pages, IDX, n_segments=args.segments,
                batch_segments=max(8, args.segments // 2))
    out["build_s"] = round(time.time() - t0, 2)

    # tombstone ~5% of docs (every 20th by id order via norms sample)
    import pyspark.sql.functions as F  # noqa: N812

    paths = IndexPaths(IDX)
    victims = (
        spark.read.parquet(paths.norms)
        .filter(F.pmod(F.col("doc_id"), F.lit(20)) == 0)
        .select("doc_id")
    )
    n_victims = victims.count()
    t0 = time.time()
    delete_docs(spark, IDX, doc_ids=[int(r.doc_id) for r in victims.collect()])
    out["tombstone_s"] = round(time.time() - t0, 2)
    out["n_tombstoned"] = int(n_victims)
    refresh_meta(IDX)

    queries = gen_queries(cfg, n_queries=6)
    before = sorted((r.query_id, r.rank, r.doc_id, round(r.score, 4))
                    for r in wand_topk(spark, IDX, queries, k=10).collect())
    srcs = list(range(args.segments // 2))
    dst = args.segments + 1

    # ---- pre-barrier crash: gated reads + rollback cost
    _crash_at_committed(spark, IDX, srcs, dst)
    refresh_meta(IDX)
    t0 = time.time()
    gated = sorted((r.query_id, r.rank, r.doc_id, round(r.score, 4))
                   for r in wand_topk(spark, IDX, queries, k=10).collect())
    out["gated_query_s"] = round(time.time() - t0, 2)
    out["gated_reads_identical"] = gated == before
    t0 = time.time()
    r = IndexReader(IDX)
    out["reader_open_gated_s"] = round(time.time() - t0, 3)
    out["reader_excluded"] = sorted(r._excluded_segs)
    t0 = time.time()
    healed = gc_aborted_merges(spark, IndexPaths(IDX))
    out["rollback_heal_s"] = round(time.time() - t0, 2)
    assert healed == [dst], healed
    refresh_meta(IDX)

    # ---- post-barrier crash: roll-forward cost (includes the purge)
    _crash_at_finish(spark, IDX, srcs, dst)
    t0 = time.time()
    healed = gc_aborted_merges(spark, IndexPaths(IDX))
    out["rollforward_heal_s"] = round(time.time() - t0, 2)
    assert healed == [dst], healed
    refresh_meta(IDX)
    out["post_heal_rows"] = wand_topk(spark, IDX, queries, k=10).count()
    from mantic_sh_spark.operators.delete import tombstone_count

    # the fold purged its srcs' tombstones; the other half's remain
    out["tombstones_left"] = int(tombstone_count(spark, IndexPaths(IDX)))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
