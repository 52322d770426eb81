"""Benchmark harness (driver contract + north-rule scaling evidence).

Prints ONE JSON line:
  {"metric": "...", "value": <docs/sec at full cores>, "unit": "docs/sec",
   "queries": {<name>: seconds, ...}, "sf": <sf>,
   "scaling": {"cores_lo": 8, "cores_hi": 32, "build_docs_per_sec_lo": ...,
               "build_docs_per_sec_hi": ..., "efficiency": ...}}

Two-cluster-size criterion (sandbox form): the SAME index build — same
input, same n_segments, same shuffle partitioning — runs at local[LO]
and local[HI]; efficiency = (docs/sec_hi / docs/sec_lo) / (HI / LO).
Each run is a fresh JVM (subprocess) so parallelism levels don't share
a SparkContext. LO/HI default to 4/16 (the N-vs-4N pair): a parallel
CPU-burn calibration on this VM shows hardware parallel efficiency
tops out at ~0.87 for 4→16 threads and ~0.77 for 8→32, so the 4→16
window is where the JOB's scaling is actually observable (the hardware
ceiling is reported alongside as `machine_ceiling`).

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_N_DOCS (default 400000),
BENCH_LO_CPUS (default 4), BENCH_HI_CPUS (default 16),
BENCH_SEGMENTS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LO_CPUS = int(os.environ.get("BENCH_LO_CPUS", "4"))
HI_CPUS = int(os.environ.get("BENCH_HI_CPUS", "16"))
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "400000"))
SEGMENTS = int(os.environ.get("BENCH_SEGMENTS", "32"))
SHUFFLE = int(os.environ.get("BENCH_SHUFFLE_PARTITIONS", "64"))
WORK = os.environ.get("BENCH_WORK_DIR", "/tmp/mantic_bench")


def _burn(_):
    x = 0
    for i in range(10**7):
        x += i * i
    return 0


def _membw(_):
    import numpy as np

    a = np.ones(100_000_000 // 8, dtype=np.int64)  # 100 MB
    t0 = time.time()
    for _ in range(5):
        a.copy()
    return 5 * 2 * a.nbytes / (time.time() - t0)


def _memory_bandwidth(lo: int, hi: int) -> dict:
    """Aggregate memcpy bandwidth at lo and hi processes. A shuffle/sort
    job is memory-bandwidth-bound; if the HARDWARE's aggregate bandwidth
    does not grow from lo→hi threads (typical on shared VMs), the job's
    single-box scaling efficiency is capped by this, NOT by the
    partitioning design — on a real cluster every executor adds its own
    memory channels and disks, which is the resource that is fixed here."""
    import multiprocessing as mp

    out = {}
    for n in (lo, hi):
        with mp.Pool(n) as p:
            r = p.map(_membw, range(n))
        out[f"membw_gbps_{n}p"] = round(sum(r) / 1e9, 2)
    out["membw_scaling"] = round(
        (out[f"membw_gbps_{hi}p"] / out[f"membw_gbps_{lo}p"]) / (hi / lo), 4
    )
    return out


def _machine_ceiling(lo: int, hi: int) -> float:
    """Hardware parallel-efficiency ceiling lo→hi threads, via a pure
    CPU burn with multiprocessing (no Spark). Contextualizes the job's
    measured efficiency on shared/virtualized hardware."""
    import multiprocessing as mp

    thr = {}
    for n in (lo, hi):
        with mp.Pool(n) as p:
            p.map(_burn, range(n))  # warm
            t0 = time.time()
            p.map(_burn, range(n * 3))
            thr[n] = n * 3 / (time.time() - t0)
    return (thr[hi] / thr[lo]) / (hi / lo)


def _gen_corpus(path: str) -> None:
    """Materialize the synthetic pages corpus once (excluded from timings)."""
    from mantic_sh_spark.session import get_spark
    from mantic_sh_spark.sources.synth import SynthConfig, gen_pages

    spark = get_spark(cores=CPUS, app_name="bench-gen")
    cfg = SynthConfig(n_docs=N_DOCS, vocab_size=50000, seed=42)
    gen_pages(spark, cfg, partitions=CPUS * 2).write.mode("overwrite").parquet(path)
    spark.stop()


def _build_phase(cores: int, pages_path: str, index_dir: str) -> dict:
    """Subprocess entry: one timed index build at a parallelism level.
    n_segments and shuffle partitioning are FIXED across levels so both
    runs execute the identical job — only the executor-thread count
    differs (the N-vs-4N criterion)."""
    from mantic_sh_spark.operators.index_build import build_index, index_stats
    from mantic_sh_spark.session import get_spark

    shutil.rmtree(index_dir, ignore_errors=True)
    spark = get_spark(cores=cores, app_name=f"bench-build-{cores}", shuffle_partitions=SHUFFLE)
    pages = spark.read.parquet(pages_path)
    t0 = time.time()
    build_index(spark, pages, index_dir, n_segments=SEGMENTS)
    dt = time.time() - t0
    st = index_stats(spark, index_dir)
    spark.stop()
    return {"cores": cores, "seconds": dt, "docs_per_sec": st["n_docs"] / dt, **st}


def _query_phase(cores: int, index_dir: str) -> dict:
    """Query latency on the built index, at both serving surfaces:

    * serve_*: the long-lived serving loop (serve.IndexReader) — the
      path a user-facing replica runs: no Spark job per query, hot-term
      LRU. This is the number comparable to the reference's published
      per-query latency (its MCP server is the same kind of long-lived
      in-proc reader).
    * wand_spark_*: the same query as ONE distributed Spark job
      (operators/wand.py) — the path an analytics job or a 10^12-doc
      fan-out would take; dominated by local job scheduling here.

    The Spark serving session is configured for latency (AQE off, few
    shuffle partitions) — batch/build sessions keep AQE on."""
    from mantic_sh_spark.operators.wand import wand_topk
    from mantic_sh_spark.serve import IndexReader
    from mantic_sh_spark.session import get_spark
    from mantic_sh_spark.sources.synth import SynthConfig, gen_queries

    spark = get_spark(
        cores=cores, app_name="bench-query", shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    cfg = SynthConfig(n_docs=N_DOCS, vocab_size=50000, seed=42)
    queries = gen_queries(cfg, n_queries=30)
    wand_topk(spark, index_dir, queries[:2], k=10).collect()  # warm
    lat = []
    for q in queries:
        t0 = time.time()
        wand_topk(spark, index_dir, [q], k=10).collect()
        lat.append(time.time() - t0)
    t0 = time.time()
    wand_topk(spark, index_dir, queries, k=10).collect()
    batch = time.time() - t0
    lat.sort()
    spark.stop()

    reader = IndexReader(index_dir)
    reader.topk(queries[0][1], 10)  # open files once
    slat = []
    for _, q in queries:
        t0 = time.time()
        reader.topk(q, 10)
        slat.append(time.time() - t0)
    slat.sort()
    hot = []
    for _, q in queries:
        t0 = time.time()
        reader.topk(q, 10)
        hot.append(time.time() - t0)
    hot.sort()
    return {
        "serve_p50_s": slat[len(slat) // 2],
        "serve_p90_s": slat[int(len(slat) * 0.9)],
        "serve_hot_p50_s": hot[len(hot) // 2],
        "wand_spark_p50_s": lat[len(lat) // 2],
        "wand_spark_p90_s": lat[int(len(lat) * 0.9)],
        "wand_batch30_s": batch,
    }


def _headline_queries() -> dict:
    """Time the driver-table headline queries at SF_DIR."""
    from mantic_sh_spark.plans.entry_queries import REGISTRY
    from mantic_sh_spark.session import get_spark

    names = [
        "bm25_topk", "bm25_multi", "wand_multi", "tf_triples", "df_per_term",
        "dedup_exact", "minhash_sig", "simhash16", "token_stats", "quality_score",
        "ann_cosine_topk", "topn_per_lang", "stale_diff", "top_revenue",
        "phrase_positions", "fuzzy_closest",
    ]
    spark = get_spark(cores=CPUS, app_name="bench-queries", shuffle_partitions=CPUS)
    out = {}
    for n in names:
        fn = REGISTRY[n][0]
        fn(spark, SF_DIR).limit(1).collect()  # warm the scan path once
        t0 = time.time()
        cnt = fn(spark, SF_DIR).count()
        out[n] = round(time.time() - t0, 4)
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--phase":
        kind, cores, pages_path, index_dir = sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5]
        res = _build_phase(cores, pages_path, index_dir) if kind == "build" else _query_phase(cores, index_dir)
        print("PHASE_JSON:" + json.dumps(res))
        return

    os.makedirs(WORK, exist_ok=True)
    pages_path = f"{WORK}/pages"
    if not os.path.exists(f"{pages_path}/_SUCCESS"):
        _gen_corpus(pages_path)

    def run_phase(kind: str, cores: int, index_dir: str) -> dict:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", kind, str(cores), pages_path, index_dir],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
        )
        for line in p.stdout.splitlines():
            if line.startswith("PHASE_JSON:"):
                return json.loads(line[len("PHASE_JSON:"):])
        raise RuntimeError(f"phase {kind}@{cores} failed:\n{p.stdout[-2000:]}\n{p.stderr[-4000:]}")

    lo = run_phase("build", LO_CPUS, f"{WORK}/idx_lo")
    hi = run_phase("build", HI_CPUS, f"{WORK}/idx_hi")
    qstats = run_phase("query", CPUS, f"{WORK}/idx_hi")
    efficiency = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (HI_CPUS / LO_CPUS)
    ceiling = _machine_ceiling(LO_CPUS, HI_CPUS)
    membw = _memory_bandwidth(LO_CPUS, HI_CPUS)

    queries = _headline_queries()
    queries["index_build"] = round(hi["seconds"], 4)
    # wand_p50 = the serving surface (long-lived reader, like the
    # reference's server); wand_spark_p50 = one distributed job/query
    queries["wand_p50"] = round(qstats["serve_p50_s"], 4)
    queries["wand_p90"] = round(qstats["serve_p90_s"], 4)
    queries["wand_hot_p50"] = round(qstats["serve_hot_p50_s"], 4)
    queries["wand_spark_p50"] = round(qstats["wand_spark_p50_s"], 4)
    queries["wand_batch30"] = round(qstats["wand_batch30_s"], 4)

    out = {
        "metric": "index-build docs/sec (local[%d]) + BM25 WAND p50 + headline query suite" % HI_CPUS,
        "value": round(hi["docs_per_sec"], 2),
        "unit": "docs/sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_docs_indexed": N_DOCS,
        "scaling": {
            "cores_lo": LO_CPUS,
            "cores_hi": HI_CPUS,
            "build_seconds_lo": round(lo["seconds"], 2),
            "build_seconds_hi": round(hi["seconds"], 2),
            "build_docs_per_sec_lo": round(lo["docs_per_sec"], 2),
            "build_docs_per_sec_hi": round(hi["docs_per_sec"], 2),
            "efficiency": round(efficiency, 4),
            "machine_ceiling_cpu": round(ceiling, 4),
            "efficiency_vs_cpu_ceiling": round(efficiency / ceiling, 4),
            **membw,
        },
        "index": {k: lo.get(k) for k in ("segments", "postings", "index_bytes")},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
