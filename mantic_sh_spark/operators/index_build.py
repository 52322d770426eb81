"""Inverted-index build: triples → salted posting blocks → segments,
with a resumable per-segment manifest (A1/A10/O6/O10 in SURVEY.md).

Pipeline (all DataFrame + applyInPandas; no per-row Python):

  pages ── extract ── build_docs ──► docs table        (stage 'docs')
                     │
                     ├─► collection_stats (n_docs, avgdl)
                     ├─► norms (doc_id, doc_len) / segment
                     └─► explode(tokens) → groupBy(doc,term) [map-side
                         partial agg] → (term, doc_id, tf, doc_len,
                         segment_id, salt)
                             │  groupBy(term, segment_id, salt)
                             │  ← THE salted repartition: head terms
                             │    split across doc-range chunks, so no
                             │    reducer ever sees more than
                             │    CHUNK_SIZE postings for one term
                             ▼
                         applyInPandas encode → block rows
                             │  (blocks carry absolute first_doc ⇒
                             │   chunk outputs concatenate in doc-id
                             │   order with no second merge pass)
                             ▼
            postings/segment_id=K (sorted by term, first_doc)
            terms/segment_id=K    (df, max_tf_norm — Catalyst agg)
            build_manifest        (per-segment lineage + metrics)

Resume (reference analog: stale-file diff src/cache.ts:147-186): a
segment whose manifest row says done is skipped; a killed build
re-runs only pending segments and produces a byte-identical index
(tests/test_resume.py).
"""

from __future__ import annotations

import time
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from ..functions.bm25 import B, K1
from ..sources.catalog import IndexPaths, append_manifest, done_segments, read_or_none
from .docs import build_docs, collection_stats, doc_stats

BLOCK_ROW_SCHEMA = (
    "term string, segment_id int, first_doc long, last_doc long, "
    "block_max double, n int, doc_gaps binary, tfs binary, dls binary"
)


def tf_triples(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf, doc_len, segment_id, salt) — T3+A1 pre-agg.

    The groupBy gets a map-side partial aggregation from Catalyst, so
    the shuffle carries unique (doc, term) pairs, not raw tokens.
    """
    ex = docs.select(
        "segment_id",
        "salt",
        "doc_id",
        "doc_len",
        F.explode("tokens").alias("term"),
    )
    return ex.groupBy("segment_id", "salt", "doc_id", "doc_len", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def _encode_fn(avgdl: float, k1: float, b: float):
    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        blocks = codec.encode_blocks(
            pdf["doc_id"].to_numpy(),
            pdf["tf"].to_numpy(),
            pdf["doc_len"].to_numpy(),
            avgdl,
            k1,
            b,
        )
        term = pdf["term"].iloc[0]
        seg = int(pdf["segment_id"].iloc[0])
        return pd.DataFrame(
            {
                "term": term,
                "segment_id": seg,
                "first_doc": [bl.first_doc for bl in blocks],
                "last_doc": [bl.last_doc for bl in blocks],
                "block_max": [bl.block_max for bl in blocks],
                "n": [bl.n for bl in blocks],
                "doc_gaps": [bl.doc_gaps for bl in blocks],
                "tfs": [bl.tfs for bl in blocks],
                "dls": [bl.dls for bl in blocks],
            }
        )

    return encode


def _delete_path(spark: SparkSession, path: str) -> None:
    """FS-agnostic recursive delete via the Hadoop FileSystem API."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    fs.delete(jpath, True)


def _cleanup_uncommitted(spark: SparkSession, paths: IndexPaths, segments: Iterable[int]) -> None:
    """Idempotency guard: drop data for segments whose manifest row was
    never committed (crash window between data commit and manifest
    append) so a resume never double-appends blocks."""
    for s in segments:
        _delete_path(spark, f"{paths.postings}/segment_id={int(s)}")
        _delete_path(spark, f"{paths.terms}/segment_id={int(s)}")


def build_postings_for_segments(
    spark: SparkSession,
    docs: DataFrame,
    paths: IndexPaths,
    segments: Iterable[int],
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> list[dict]:
    """Build + commit postings/terms for the given segments; return
    manifest metric rows (not yet appended)."""
    segs = sorted(set(int(s) for s in segments))
    if not segs:
        return []
    started = time.time()
    batch = docs.filter(F.col("segment_id").isin(segs))
    triples = tf_triples(batch)
    blocks = triples.groupBy("term", "segment_id", "salt").applyInPandas(
        _encode_fn(avgdl, k1, b), schema=BLOCK_ROW_SCHEMA
    )
    # One writer partition per segment → one sorted run per segment dir;
    # row-group min/max stats on `term` give query-time block pruning.
    (
        blocks.repartition("segment_id")
        .sortWithinPartitions("term", "first_doc")
        .write.mode("append")
        .partitionBy("segment_id")
        .parquet(paths.postings)
    )
    # Term directory: per-(segment, term) df + score upper bound. Pure
    # Catalyst agg over the committed blocks (re-read → lineage cut).
    written = spark.read.parquet(paths.postings).filter(F.col("segment_id").isin(segs))
    terms = written.groupBy("segment_id", "term").agg(
        F.sum("n").alias("df"),
        F.max("block_max").alias("max_tf_norm"),
    )
    terms.repartition("segment_id").sortWithinPartitions("term").write.mode("append").partitionBy(
        "segment_id"
    ).parquet(paths.terms)

    metrics = (
        written.groupBy("segment_id")
        .agg(
            F.sum("n").alias("n_postings"),
            F.count_distinct("term").alias("n_terms"),
            (F.sum(F.length("doc_gaps")) + F.sum(F.length("tfs")) + F.sum(F.length("dls"))).alias("bytes"),
        )
        .collect()
    )
    n_docs_by_seg = {
        r.segment_id: r.n
        for r in batch.groupBy("segment_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    seg_stats = [(int(s), float(avgdl)) for s in segs]
    spark.createDataFrame(seg_stats, "segment_id int, build_avgdl double").coalesce(1).write.mode(
        "append"
    ).parquet(paths.segment_stats)
    finished = time.time()
    return [
        {
            "segment_id": r.segment_id,
            "stage": "postings",
            "status": "done",
            "n_docs": n_docs_by_seg.get(r.segment_id, 0),
            "n_terms": r.n_terms,
            "n_postings": r.n_postings,
            "bytes": r.bytes,
            "started_at": started,
            "finished_at": finished,
        }
        for r in metrics
    ]


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    n_segments: int = 8,
    k1: float = K1,
    b: float = B,
    batch_segments: int | None = None,
    max_batches: int | None = None,
) -> IndexPaths:
    """Full resumable build. Re-running after a crash (or after
    max_batches stopped it early) completes only pending segments.

    batch_segments controls manifest-commit granularity: segments are
    built in parallel within a batch (one Spark job) and the manifest
    row set is committed per batch. Smaller batches = finer resume
    granularity; None = all pending segments in one job.
    """
    paths = IndexPaths(index_dir)

    # ---- stage 'docs': ids + stats, committed once ----
    if -1 not in done_segments(spark, paths, stage="docs"):
        t0 = time.time()
        docs = build_docs(pages, n_segments=n_segments)
        (
            docs.drop("tokens")
            .repartition("segment_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .partitionBy("segment_id")
            .parquet(paths.docs)
        )
        docs_read = spark.read.parquet(paths.docs)
        collection_stats(docs_read).coalesce(1).write.mode("overwrite").parquet(paths.collection_stats)
        doc_stats(docs_read).repartition("segment_id").write.mode("overwrite").partitionBy(
            "segment_id"
        ).parquet(paths.norms)
        n_docs = docs_read.count()
        append_manifest(
            spark,
            paths,
            [{"segment_id": -1, "stage": "docs", "status": "done", "n_docs": n_docs, "started_at": t0}],
        )

    stats = spark.read.parquet(paths.collection_stats).collect()[0]
    avgdl = float(stats.avgdl)

    docs = spark.read.parquet(paths.docs)
    from ..functions.tokenize import tokens_col  # re-derive tokens (cheap JVM regex)

    docs = docs.withColumn("tokens", tokens_col("text"))

    all_segs = sorted(r.segment_id for r in docs.select("segment_id").distinct().collect())
    pending = [s for s in all_segs if s not in done_segments(spark, paths, stage="postings")]
    if not pending:
        return paths

    _cleanup_uncommitted(spark, paths, pending)
    bs = batch_segments or len(pending)
    batches = [pending[i : i + bs] for i in range(0, len(pending), bs)]
    if max_batches is not None:
        batches = batches[:max_batches]
    for seg_batch in batches:
        rows = build_postings_for_segments(spark, docs, paths, seg_batch, avgdl, k1, b)
        append_manifest(spark, paths, rows)
    return paths


def index_stats(spark: SparkSession, index_dir: str) -> dict:
    """Build metrics summary (driver-side, small)."""
    paths = IndexPaths(index_dir)
    out: dict = {}
    cs = read_or_none(spark, paths.collection_stats)
    if cs is not None:
        r = cs.collect()[0]
        out["n_docs"], out["avgdl"] = r.n_docs, r.avgdl
    m = read_or_none(spark, paths.manifest)
    if m is not None:
        done = m.filter((F.col("stage") == "postings") & (F.col("status") == "done"))
        agg = done.agg(
            F.count(F.lit(1)).alias("segments"),
            F.sum("n_postings").alias("postings"),
            F.sum("bytes").alias("bytes"),
        ).collect()[0]
        out.update(segments=agg.segments, postings=agg.postings, index_bytes=agg.bytes)
    return out
