"""SparkSession factory tuned for this engine.

Local-mode settings mirror what a cluster deployment would set per
executor; see bench.py for the two-parallelism-level scaling harness.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "mantic_sh_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None → local[*]. shuffle_partitions defaults to the core
    count — on a real cluster this would be ~2-3× total cores and AQE
    coalesces it down at runtime. master overrides the local[N] form —
    e.g. "local-cluster[4,4,6144]" runs 4 SEPARATE executor JVMs of 4
    cores (the multi-executor form bench.py uses for the
    two-cluster-size scaling evidence); executors get PYTHONPATH so
    Python workers can import this package.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    if master is None:
        master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cores if cores else (os.cpu_count() or 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # shuffle/spill/broadcast bytes are the scaling bottleneck for
        # the build's wide shuffle; zstd trades cheap CPU for ~30%
        # fewer IO bytes vs lz4 (measured +6% build throughput here,
        # more on bandwidth-starved clusters)
        .config("spark.io.compression.codec", "zstd")
        # parquet at zstd too: measured (150k-doc A/B, warm) build time
        # within noise of snappy on this memory-backed FS, but docs
        # table bytes -37% and postings -20% — on a real cluster the
        # table write is disk/object-store I/O and the saved bytes are
        # the docs stage's bottleneck term
        .config("spark.sql.parquet.compression.codec", "zstd")
        # convert multi-value IN predicates to InSet at any length:
        # InSet keeps the value set as a codegen REFERENCE object, so
        # per-query term lists produce IDENTICAL generated source and
        # hit the codegen cache — inlined In literals force a Janino
        # recompile (~0.2-0.4 s) for every fresh query's plan. Parquet
        # pushdown translates InSet the same as In.
        .config("spark.sql.optimizer.inSetConversionThreshold", "1")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/mantic_warehouse"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if master.startswith("local-cluster"):
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        b = b.config("spark.executorEnv.PYTHONPATH", pkg_root)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
