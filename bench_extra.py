"""Per-query isolation harness (guide §1.1/§1.4) — NOT the driver bench.

Times each headline registry query exactly the way bench.py does
(`fn(spark, SF_DIR).count()` after a limit(1) warm) AND with the noop
sink (computes every column, guide §1.4), and captures
`.explain("formatted")` for the plan-diff evidence in plans/r06/.

Usage:
  python bench_extra.py [--plans plans/r06 --suffix before] [names...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_EXTRA_REPS (default 2).
Prints one JSON object (not the driver line — bench.py owns that).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))

# mirrors bench.py _headline_queries' name list verbatim (bench.py is
# frozen for driver measurement and keeps the list function-local, so
# it cannot be imported; re-sync manually if the driver set changes)
HEADLINE = [
    "bm25_topk", "bm25_multi", "wand_multi", "tf_triples", "df_per_term",
    "dedup_exact", "minhash_sig", "simhash16", "token_stats", "quality_score",
    "ann_cosine_topk", "topn_per_lang", "stale_diff", "top_revenue",
    "phrase_positions", "fuzzy_closest",
]


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args or HEADLINE

    from mantic_sh_spark.plans.entry_queries import REGISTRY
    from mantic_sh_spark.session import get_spark

    spark = get_spark(cores=CPUS, app_name="bench-extra", shuffle_partitions=CPUS)
    out = {}
    for n in names:
        fn = REGISTRY[n][0]
        spark.sparkContext.setJobDescription(f"bench_extra:{n}")
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            with open(f"{plans_dir}/{n}_{suffix}.txt", "w") as f:
                f.write(buf.getvalue())
        fn(spark, SF_DIR).limit(1).collect()  # warm the scan path once
        counts = []
        for _ in range(REPS):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            counts.append(time.time() - t0)
        noops = []
        for _ in range(REPS):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            noops.append(time.time() - t0)
        out[n] = {"count_s": round(min(counts), 4), "noop_s": round(min(noops), 4)}
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "queries": out}, indent=1))


if __name__ == "__main__":
    main()
