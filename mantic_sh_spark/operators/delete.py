"""Document deletion — LSM tombstones (the `deleted` leg of the
reference's stale-file diff, src/cache.ts:179-186 / A10 in SURVEY.md).

`delete_docs` appends doc ids to a tombstones table: queries exclude
them IMMEDIATELY (Block-Max WAND checks liveness at heap-push time —
the Lucene live-docs pattern — so pruning bounds stay sound and the
heap fills with the k best LIVE docs). The postings themselves are
immutable until `merge_segments(..., purge=True)` rewrites them away
and re-baselines collection stats.

Deleted docs keep contributing to df/avgdl until a purge — the
standard Lucene/LSM trade (scores drift only after enough deletes,
and a purge restores exactness; tests prove purge == fresh build on
the remaining corpus).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import IndexPaths, read_or_none


def delete_docs_df(spark: SparkSession, index_dir: str, ids_df: DataFrame) -> int:
    """Tombstone a DataFrame of doc ids (column `doc_id`) — the
    scale path: the id set is never materialized on the driver; the
    tombstone table is written distributed. Returns the count (one
    agg job over the incoming set)."""
    paths = IndexPaths(index_dir)
    ids_df = ids_df.select(F.col("doc_id").cast("long")).distinct()
    n = ids_df.count()
    if not n:
        return 0
    ids_df.write.mode("append").parquet(paths.tombstones)
    from .wand import refresh_meta

    refresh_meta(index_dir)
    return n


def delete_docs(
    spark: SparkSession,
    index_dir: str,
    doc_ids: list[int] | None = None,
    urls: list[str] | None = None,
) -> int:
    """Tombstone docs by id or url. Returns the number tombstoned.
    The url → doc_id resolution stays distributed (semi-join against
    the docs table); only the caller-supplied lists touch the driver."""
    import pandas as pd

    paths = IndexPaths(index_dir)
    parts = []
    if doc_ids:
        pdf = pd.DataFrame({"doc_id": pd.array(sorted(set(int(d) for d in doc_ids)), dtype="int64")})
        parts.append(spark.createDataFrame(pdf, "doc_id long"))
    if urls:
        upd = pd.DataFrame({"url": sorted(set(urls))})
        url_df = spark.createDataFrame(upd, "url string")
        parts.append(
            spark.read.parquet(paths.docs)
            .join(F.broadcast(url_df), "url", "left_semi")
            .select("doc_id")
        )
    if not parts:
        return 0
    ids_df = parts[0]
    for p in parts[1:]:
        ids_df = ids_df.unionByName(p)
    return delete_docs_df(spark, index_dir, ids_df)


def tombstone_df(spark: SparkSession, paths: IndexPaths) -> DataFrame | None:
    """Distinct tombstoned doc ids as a DataFrame (None if none) — the
    form every plan-side consumer (anti-joins, purge filters) uses, so
    no id list ever enters an expression tree or the driver."""
    t = read_or_none(spark, paths.tombstones)
    if t is None:
        return None
    return t.select("doc_id").distinct()


def tombstone_ids(spark: SparkSession, paths: IndexPaths) -> np.ndarray:
    """All tombstoned doc ids as a sorted int64 array (empty if none) —
    the in-memory liveness form the WAND/phrase kernels ship to tasks
    (Arrow toPandas, no per-row driver objects). Bounded use: fine to
    ~10^7 live tombstones (~80 MB closure); beyond that an index should
    be purge-merged (merge_segments(purge=True)) — the LSM contract —
    or liveness moves to per-segment bitmap sidecars."""
    t = tombstone_df(spark, paths)
    if t is None:
        return np.empty(0, dtype=np.int64)
    ids = t.toPandas()["doc_id"].to_numpy(dtype=np.int64, copy=True)
    ids.sort()
    return ids


def live_docs(docs: DataFrame, spark: SparkSession, paths: IndexPaths) -> DataFrame:
    """docs minus tombstones (anti-join) — the exhaustive-path filter."""
    t = read_or_none(spark, paths.tombstones)
    if t is None:
        return docs
    return docs.join(t.select("doc_id").distinct(), "doc_id", "left_anti")
