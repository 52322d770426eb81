"""Benchmark harness (driver contract + north-rule scaling evidence).

Prints ONE JSON line:
  {"metric": "...", "value": <docs/sec at full cores>, "unit": "docs/sec",
   "queries": {<name>: seconds, ...}, "sf": <sf>,
   "scaling": {"cores_lo": 8, "cores_hi": 32, "build_docs_per_sec_lo": ...,
               "build_docs_per_sec_hi": ..., "efficiency": ...}}

Two-cluster-size criterion (sandbox form): the SAME index build runs at
local[LO] and local[HI] on the SAME input; efficiency =
(docs/sec_hi / docs/sec_lo) / (HI / LO). Each run is a fresh JVM
(subprocess) so parallelism levels don't share a SparkContext.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_N_DOCS (default 40000),
BENCH_LO_CPUS (default 8).
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
LO_CPUS = int(os.environ.get("BENCH_LO_CPUS", "8"))
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "40000"))
WORK = os.environ.get("BENCH_WORK_DIR", "/tmp/mantic_bench")


def _gen_corpus(path: str) -> None:
    """Materialize the synthetic pages corpus once (excluded from timings)."""
    from mantic_sh_spark.session import get_spark
    from mantic_sh_spark.sources.synth import SynthConfig, gen_pages

    spark = get_spark(cores=CPUS, app_name="bench-gen")
    cfg = SynthConfig(n_docs=N_DOCS, vocab_size=20000, seed=42)
    gen_pages(spark, cfg, partitions=CPUS * 2).write.mode("overwrite").parquet(path)
    spark.stop()


def _build_phase(cores: int, pages_path: str, index_dir: str) -> dict:
    """Subprocess entry: one timed index build at a parallelism level."""
    from mantic_sh_spark.operators.index_build import build_index, index_stats
    from mantic_sh_spark.session import get_spark

    shutil.rmtree(index_dir, ignore_errors=True)
    spark = get_spark(cores=cores, app_name=f"bench-build-{cores}", shuffle_partitions=cores)
    pages = spark.read.parquet(pages_path)
    t0 = time.time()
    build_index(spark, pages, index_dir, n_segments=max(8, cores // 2))
    dt = time.time() - t0
    st = index_stats(spark, index_dir)
    spark.stop()
    return {"cores": cores, "seconds": dt, "docs_per_sec": st["n_docs"] / dt, **st}


def _query_phase(cores: int, index_dir: str) -> dict:
    """WAND query latency over a mixed query set on the built index."""
    from mantic_sh_spark.operators.wand import wand_topk
    from mantic_sh_spark.session import get_spark
    from mantic_sh_spark.sources.synth import SynthConfig, gen_queries

    spark = get_spark(cores=cores, app_name="bench-query", shuffle_partitions=cores)
    cfg = SynthConfig(n_docs=N_DOCS, vocab_size=20000, seed=42)
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
    return {
        "wand_p50_s": lat[len(lat) // 2],
        "wand_p90_s": lat[int(len(lat) * 0.9)],
        "wand_batch30_s": batch,
    }


def _headline_queries() -> dict:
    """Time the driver-table headline queries at SF_DIR."""
    from mantic_sh_spark.plans.entry_queries import REGISTRY
    from mantic_sh_spark.session import get_spark

    names = [
        "bm25_topk", "bm25_multi", "tf_triples", "df_per_term", "dedup_exact",
        "minhash_sig", "simhash16", "token_stats", "quality_score",
        "ann_cosine_topk", "topn_per_lang", "stale_diff", "top_revenue",
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
    hi = run_phase("build", CPUS, f"{WORK}/idx_hi")
    qstats = run_phase("query", CPUS, f"{WORK}/idx_hi")
    efficiency = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (CPUS / LO_CPUS)

    queries = _headline_queries()
    queries["index_build"] = round(hi["seconds"], 4)
    queries["wand_p50"] = round(qstats["wand_p50_s"], 4)
    queries["wand_batch30"] = round(qstats["wand_batch30_s"], 4)

    out = {
        "metric": "index-build docs/sec (local[%d]) + BM25 WAND p50 + headline query suite" % CPUS,
        "value": round(hi["docs_per_sec"], 2),
        "unit": "docs/sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_docs_indexed": N_DOCS,
        "scaling": {
            "cores_lo": LO_CPUS,
            "cores_hi": CPUS,
            "build_seconds_lo": round(lo["seconds"], 2),
            "build_seconds_hi": round(hi["seconds"], 2),
            "build_docs_per_sec_lo": round(lo["docs_per_sec"], 2),
            "build_docs_per_sec_hi": round(hi["docs_per_sec"], 2),
            "efficiency": round(efficiency, 4),
        },
        "index": {k: lo.get(k) for k in ("segments", "postings", "index_bytes")},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
