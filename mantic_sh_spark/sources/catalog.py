"""Index-table catalog: Iceberg when configured, partitioned Parquet otherwise.

The reference persists its index as an atomically-renamed JSON file
(src/cache.ts:87-107) with version/staleness bookkeeping
(src/cache.ts:112-186). Here each index component is a table; atomic
visibility comes from Iceberg snapshot commits when an Iceberg catalog
is configured on the session, else from Spark's Parquet output-commit
protocol (job-level atomicity: a crashed job leaves only _temporary
dirs, never partial committed segment data). The `build_manifest`
table is the resume primitive — a segment is only considered built
once its manifest row is committed AFTER its data.

Sandbox note: no Iceberg runtime jar is installed locally, so the
Parquet path is what tests exercise; on a real cluster add
  --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
  --conf spark.sql.catalog.ice=org.apache.iceberg.spark.SparkCatalog
and pass table identifiers instead of paths.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), False),  # 'docs' | 'postings'
        T.StructField("status", T.StringType(), False),  # 'done'
        T.StructField("n_docs", T.LongType(), True),
        T.StructField("n_terms", T.LongType(), True),
        T.StructField("n_postings", T.LongType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("started_at", T.DoubleType(), True),
        T.StructField("finished_at", T.DoubleType(), True),
        T.StructField("attempt", T.IntegerType(), True),
        # build-time avgdl for WAND bound inflation under avgdl drift
        # (was a separate segment_stats table; folded in to save a
        # commit per build batch)
        T.StructField("build_avgdl", T.DoubleType(), True),
    ]
)


@dataclass(frozen=True)
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def terms(self) -> str:
        return os.path.join(self.root, "terms")

    @property
    def norms(self) -> str:
        return os.path.join(self.root, "norms")

    @property
    def collection_stats(self) -> str:
        return os.path.join(self.root, "collection_stats")

    @property
    def tombstones(self) -> str:
        # deleted doc ids (LSM tombstones): queries exclude them
        # immediately; merge(purge=True) rewrites them away
        return os.path.join(self.root, "tombstones")

    @property
    def term_dict(self) -> str:
        # OPTIONAL (term, tid, df) vocabulary sidecar for fuzzy
        # expansion / debugging — built on demand
        # (operators/index_build.build_term_dictionary), never on the
        # build hot path; the core index carries no term strings
        return os.path.join(self.root, "term_dictionary")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "build_manifest")


def _path_has_data(spark: SparkSession, path: str) -> bool:
    """FileSystem-API existence probe (no Spark job, no logged
    exception): true when the path exists and holds at least one
    non-hidden file — a 0-row parquet write leaves only _SUCCESS,
    which the parquet reader cannot infer a schema from."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return False
    stack = [jpath]
    while stack:
        cur = stack.pop()
        for st in fs.listStatus(cur):
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue
            if st.isDirectory():
                stack.append(st.getPath())
            else:
                return True
    return False


def read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    if not _path_has_data(spark, path):
        return None
    return spark.read.parquet(path)


def read_manifest(spark: SparkSession, paths: IndexPaths) -> DataFrame:
    df = read_or_none(spark, paths.manifest)
    if df is None:
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return df


def append_manifest(spark: SparkSession, paths: IndexPaths, rows: list[dict]) -> None:
    now = time.time()
    full = [
        {
            "segment_id": int(r["segment_id"]),
            "stage": r["stage"],
            "status": r.get("status", "done"),
            "n_docs": r.get("n_docs"),
            "n_terms": r.get("n_terms"),
            "n_postings": r.get("n_postings"),
            "bytes": r.get("bytes"),
            "started_at": r.get("started_at", now),
            "finished_at": r.get("finished_at", now),
            "attempt": r.get("attempt", 1),
            "build_avgdl": r.get("build_avgdl"),
        }
        for r in rows
    ]
    # pandas → Arrow path: createDataFrame from Python lists takes the
    # slow RDD route (seconds per call); from pandas it is one Arrow batch
    import pandas as pd

    pdf = pd.DataFrame(full, columns=[f.name for f in MANIFEST_SCHEMA.fields])
    spark.createDataFrame(pdf, MANIFEST_SCHEMA).coalesce(1).write.mode("append").parquet(
        paths.manifest
    )


def done_segments(spark: SparkSession, paths: IndexPaths, stage: str = "postings") -> set[int]:
    m = read_or_none(spark, paths.manifest)
    if m is None:  # no manifest yet — avoid an empty-DataFrame Spark job
        return set()
    # dedup driver-side: the manifest is tiny and .distinct() would be
    # the session's first shuffle (expensive machinery spin-up)
    rows = m.filter((F.col("stage") == stage) & (F.col("status") == "done")).select("segment_id").collect()
    return {r.segment_id for r in rows}
