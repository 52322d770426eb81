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


def delete_docs(
    spark: SparkSession,
    index_dir: str,
    doc_ids: list[int] | None = None,
    urls: list[str] | None = None,
) -> int:
    """Tombstone docs by id or url. Returns the number tombstoned."""
    import pandas as pd

    paths = IndexPaths(index_dir)
    ids: list[int] = [int(d) for d in (doc_ids or [])]
    if urls:
        rows = (
            spark.read.parquet(paths.docs)
            .filter(F.col("url").isin(list(urls)))
            .select("doc_id")
            .collect()
        )
        ids.extend(int(r.doc_id) for r in rows)
    ids = sorted(set(ids))
    if not ids:
        return 0
    spark.createDataFrame(
        pd.DataFrame({"doc_id": pd.array(ids, dtype="int64")}), "doc_id long"
    ).coalesce(1).write.mode("append").parquet(paths.tombstones)
    from .wand import refresh_meta

    refresh_meta(index_dir)
    return len(ids)


def tombstone_ids(spark: SparkSession, paths: IndexPaths) -> np.ndarray:
    """All tombstoned doc ids as a sorted int64 array (empty if none).
    At real scale this becomes a per-segment roaring bitmap broadcast;
    the sorted-array + searchsorted form here has the same interface."""
    t = read_or_none(spark, paths.tombstones)
    if t is None:
        return np.empty(0, dtype=np.int64)
    ids = np.array([r.doc_id for r in t.select("doc_id").distinct().collect()], dtype=np.int64)
    ids.sort()
    return ids


def live_docs(docs: DataFrame, spark: SparkSession, paths: IndexPaths) -> DataFrame:
    """docs minus tombstones (anti-join) — the exhaustive-path filter."""
    t = read_or_none(spark, paths.tombstones)
    if t is None:
        return docs
    return docs.join(t.select("doc_id").distinct(), "doc_id", "left_anti")
