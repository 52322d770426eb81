"""k-way segment merge (U4 in SURVEY.md §2.10).

Reference analog: the per-chunk top-k flatten + re-sort merge of
src/parallel-mantic.ts:62-75 — applied here to the index itself:
several small segments are folded into one, the standard LSM-style
maintenance step after incremental builds.

Because segments own DISJOINT doc-id ranges (operators/docs.py gives
segment s the range [s·SEG_STRIDE, …)), posting blocks from different
segments never interleave: a merged posting list is just the union of
block rows ordered by (term, first_doc). The merge is therefore pure
Catalyst — union + re-sort — with NO decode. `compact=True` adds an
applyInPandas pass that re-encodes each term's blocks to full
BLOCK_SIZE (chunk-boundary tails leave ragged blocks behind), grouped
by (term, src segment) so no group exceeds one source segment's
postings — the same bounded-group discipline as the build.

Block-max metadata survives unchanged: maxima are idf-independent
(functions/codec.py) and doc_len/avgdl are not altered by a merge.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from ..functions.bm25 import B, K1
from ..sources.catalog import IndexPaths, append_manifest, read_or_none
from .index_build import BLOCK_ROW_SCHEMA, _delete_path


def _purge_docs_and_stats(spark, paths, purge_df, srcs) -> None:
    """Make deletes real: drop purged rows from the docs dirs that hold
    them, re-baseline collection_stats over the remaining norms, and
    clear the satisfied tombstones. Docs dirs never move across merges,
    so the dirs to rewrite come from the purged ids' ORIGINAL segments
    (doc_id DIV stride), not from the merge's src postings segments.
    All id-set filters are ANTI-JOINS against the purge DataFrame — no
    id list ever reaches the driver or an expression tree, so a
    10^8-tombstone purge plans the same as a 10-tombstone one (the
    dir list itself is one tiny distinct per original segment)."""

    from .docs import SEG_STRIDE

    doc_segs = [
        int(r.s)
        for r in purge_df.select(
            F.expr(f"CAST(doc_id DIV {SEG_STRIDE} AS INT)").alias("s")
        ).distinct().collect()
    ]
    for seg in doc_segs:
        src_dir = f"{paths.docs}/segment_id={int(seg)}"
        remaining = read_or_none(spark, src_dir)
        if remaining is None:
            continue
        staging = f"{paths.root}/docs_purge_tmp"
        _delete_path(spark, staging)
        remaining.join(purge_df, "doc_id", "left_anti").write.mode("overwrite").parquet(staging)
        _delete_path(spark, src_dir)
        spark.read.parquet(staging).write.mode("overwrite").parquet(src_dir)
        _delete_path(spark, staging)
    # stats over the remaining corpus (a purge rewrites norms anyway,
    # so this one full agg is already proportional to work done; the
    # exact integer sum_dl re-baselines the incremental-stats chain —
    # format v5)
    from .index_build import write_collection_stats

    norms_all = spark.read.parquet(paths.norms)
    row = norms_all.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("doc_len").alias("sum_dl")
    ).collect()[0]
    write_collection_stats(spark, paths, int(row.n_docs or 0), int(row.sum_dl or 0))
    # satisfied tombstones = exactly the src segments' partitions plus
    # the orphan partition (-1): the tombstones table is hive-
    # partitioned by the postings-owning segment (delete.delete_docs_df,
    # re-homed on non-purge merges), so clearing them is a metadata
    # partition delete — no table rewrite, regardless of tombstone count
    for s in list(srcs) + [-1]:
        _delete_path(spark, f"{paths.tombstones}/segment_id={int(s)}")


def _live_tombstone_segments(spark, paths) -> list[int]:
    from .index_build import _list_segments

    return _list_segments(spark, paths.tombstones)


def maybe_compact(
    spark: SparkSession,
    index_dir: str,
    max_segments: int = 16,
    k1: float = K1,
    b: float = B,
) -> int | None:
    """LSM maintenance policy: when the live segment count exceeds
    max_segments, fold the SMALLEST half (by postings bytes) into one
    compacted segment — tombstones owned by those segments purge as a
    side effect. Keeps per-query fan-out (one WAND run per segment)
    and block raggedness bounded under continuous ingestion; the cost
    is proportional to the small segments being folded, never the
    whole index (the standard tiered-compaction trade). Returns the
    destination segment id, or None if below threshold."""
    from .index_build import _list_segments

    paths = IndexPaths(index_dir)
    segs = _list_segments(spark, paths.postings)
    if len(segs) <= max_segments:
        return None
    sizes = {
        r.segment_id: r.bytes
        for r in spark.read.parquet(paths.terms)
        .groupBy("segment_id")
        .agg(F.sum("bytes").alias("bytes"))
        .collect()
    }
    by_size = sorted(segs, key=lambda s: (sizes.get(s, 0), s))
    n_fold = max(2, len(segs) - max_segments + 1)
    victims = by_size[:n_fold]
    # fresh dst id must clear BOTH tables' dirs: docs dirs keep their
    # original ids across compactions, so extends allocate from the
    # same combined max — never reuse either side's id space
    dst = max(segs + _list_segments(spark, paths.docs)) + 1
    return merge_segments(spark, index_dir, victims, dst_segment=dst,
                          compact=True, purge=True, k1=k1, b=b)


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    src_segments: list[int],
    dst_segment: int | None = None,
    compact: bool = True,
    purge: bool = True,
    k1: float = K1,
    b: float = B,
) -> int:
    """Fold src segments into one. Returns the destination segment id.

    purge=True (requires compact) rewrites away tombstoned postings of
    the source segments, drops their docs/norms rows, re-baselines
    collection_stats, and clears the satisfied tombstones — the LSM
    "deletes become real at merge time" step.

    Write order is crash-safe: the destination is fully committed
    before sources are deleted; a crash in between leaves duplicates
    visible, which `wand_topk` would double-count — so dst uses a NEW
    segment id and readers should treat 'merge' manifest rows as the
    source of truth for live segments (finalize step deletes sources).
    """
    paths = IndexPaths(index_dir)
    from .index_build import check_format, gc_aborted_extends

    check_format(spark, paths)  # never rewrite across format generations
    # heal any crashed fold first — a purge re-baselines stats over the
    # FULL norms table, which must not include orphan (uncommitted)
    # extend rows
    gc_aborted_extends(spark, paths)
    srcs = sorted(int(s) for s in src_segments)
    if dst_segment is None:
        dst_segment = srcs[0]
    started = time.time()
    stats = spark.read.parquet(paths.collection_stats).collect()[0]
    avgdl = float(stats.avgdl)

    # tombstones owned by the source segments. Ownership comes from the
    # NORMS table: norms rows MOVE with merges (docs rows never do), so
    # norms/segment_id=s lists exactly the doc ids whose postings live
    # in segment s — correct across any number of compaction
    # generations, where doc_id DIV STRIDE only names the ORIGINAL
    # segment (review r2 finding). purge_df is the plan-side form
    # (anti-joins, docs purge, stats re-baseline); the streaming
    # compactor gets NO id array — each task loads the union of the src
    # segments' liveness sidecars itself (codec.compact_stream_fn
    # dead_src: the tombstones table is hive-partitioned by the
    # postings-owning segment, so those partitions ARE the owned set),
    # matching the per-segment discipline of the query kernels. A full
    # purge-compaction of a billion-tombstone index therefore never
    # materializes dead ids on the driver or in a closure (review r3
    # finding).
    purge_df = None
    purge_stage = f"{paths.root}/purge_ids_tmp"
    if purge and compact:
        from .delete import tombstone_df

        t = tombstone_df(spark, paths)
        if t is not None:
            norms_all = spark.read.parquet(paths.norms)
            src_norms = norms_all.filter(F.col("segment_id").isin(srcs)).select("doc_id")
            owned = t.join(src_norms, "doc_id", "left_semi")
            # orphan tombstones (ids with no norms row anywhere — the
            # doc never existed or was already purged) are vacuously
            # satisfied: clear them at any purge so they can't
            # accumulate unboundedly
            orphans = t.join(norms_all.select("doc_id"), "doc_id", "left_anti")
            # STAGE the owned set before any mutation: the lazy plan
            # reads the src segments' norms partitions, which this merge
            # moves below — consumers after that point must read the
            # staged copy, not re-execute the plan
            _delete_path(spark, purge_stage)
            owned.unionByName(orphans).write.mode("overwrite").parquet(purge_stage)
            purge_df = read_or_none(spark, purge_stage)

    raw = spark.read.parquet(paths.postings)
    has_positions = "positions" in raw.columns
    blocks = (
        raw.filter(F.col("segment_id").isin(srcs))
        .withColumn("src_segment", F.col("segment_id"))
        .withColumn("segment_id", F.lit(int(dst_segment)))
    )
    # range-partition by (tid, first_doc): sorted multi-file layout
    # (row-group AND file-level tid pruning); AQE coalesces small
    # merges. A single-file write would serialize the merged segment.
    ordered = (
        blocks.drop("src_segment")
        .repartitionByRange(F.col("tid"), F.col("first_doc"))
        .sortWithinPartitions("tid", "first_doc")
    )
    if compact:
        # streaming Arrow compactor: aligned full blocks pass through
        # WITHOUT decode; ragged chunk/segment tails buffer into
        # O(block_size) leftovers and re-emit full blocks — a stop term
        # over the whole merged segment streams, never materializes.
        # When live postings segments REMAIN after this merge, the
        # compactor keeps every re-encoded block within one doc-id
        # stride range (split_ranges): blocks spanning the gap between
        # non-contiguous source ranges would envelop a surviving
        # segment's doc range and break the serving reader's
        # global-kernel disjointness premise (which would silently
        # demote those terms to the swept path forever). A merge that
        # folds EVERY live segment compacts maximally — nothing remains
        # to interleave, and future extends allocate ranges strictly
        # above all existing ones.
        from .index_build import BLOCK_ROW_SCHEMA_POS

        # split only when a SURVIVING segment's doc span overlaps the
        # sources' combined span (then a cross-range block would
        # envelop it): a contiguous fold with everything else above or
        # below — and any fold of ALL live segments — keeps maximal
        # cross-range compaction. One tiny stats-pruned agg (two int
        # columns) decides it.
        spans = {
            r.segment_id: (r.lo, r.hi)
            for r in raw.groupBy("segment_id").agg(
                F.min("first_doc").alias("lo"), F.max("last_doc").alias("hi")
            ).collect()
        }
        src_spans = [spans[s] for s in srcs if s in spans]
        src_lo = min(lo for lo, _ in src_spans) if src_spans else 0
        src_hi = max(hi for _, hi in src_spans) if src_spans else 0
        split_ranges = any(
            lo <= src_hi and hi >= src_lo
            for s, (lo, hi) in spans.items()
            if s not in srcs
        )
        merged = ordered.mapInArrow(
            codec.compact_stream_fn(
                avgdl, k1, b,
                dead_src=(paths.tombstones, srcs) if purge_df is not None else None,
                with_positions=has_positions,
                split_ranges=split_ranges,
            ),
            schema=BLOCK_ROW_SCHEMA_POS if has_positions else BLOCK_ROW_SCHEMA,
        )
    else:
        merged = ordered

    staging = f"{paths.root}/postings_merge_tmp"
    _delete_path(spark, staging)
    merged.write.mode("overwrite").parquet(staging)

    committed = spark.read.parquet(staging)
    n_postings = committed.agg(F.sum("n")).collect()[0][0]
    n_terms = committed.select("tid").distinct().count()
    nbytes = committed.agg(F.sum("nbytes")).collect()[0][0]

    # commit dst FIRST, then retire sources — the crash-safety order the
    # docstring promises (a crash in between leaves src+dst duplicates,
    # recoverable by re-running the merge; the reverse order could lose
    # the sources with only the unregistered staging dir holding them).
    # When dst REUSES a src id (dst_segment defaults to srcs[0]) the
    # overwrite of that dir is the unavoidable in-place window the
    # docstring tells callers to avoid with a fresh dst id.
    committed.drop("segment_id").write.mode("overwrite").parquet(
        f"{paths.postings}/segment_id={int(dst_segment)}"
    )
    _delete_path(spark, staging)

    final = spark.read.parquet(f"{paths.postings}/segment_id={int(dst_segment)}")
    terms = final.groupBy("tid").agg(
        F.sum("n").alias("df"),
        F.max("block_max").alias("max_tf_norm"),
        F.sum("nbytes").cast("long").alias("bytes"),
    )
    terms.coalesce(1).sortWithinPartitions("tid").write.mode("overwrite").parquet(
        f"{paths.terms}/segment_id={int(dst_segment)}"
    )
    for s in srcs:
        if s != dst_segment:
            _delete_path(spark, f"{paths.postings}/segment_id={s}")
            _delete_path(spark, f"{paths.terms}/segment_id={s}")
    # norms: move source norm rows under the dst segment dir (minus
    # purged docs)
    norms = spark.read.parquet(paths.norms).filter(F.col("segment_id").isin(srcs))
    if purge_df is not None:
        norms = norms.join(purge_df, "doc_id", "left_anti")
    norms_pdf = norms.drop("segment_id")
    staging_n = f"{paths.root}/norms_merge_tmp"
    _delete_path(spark, staging_n)
    norms_pdf.repartitionByRange(F.col("doc_id")).sortWithinPartitions("doc_id").write.mode(
        "overwrite"
    ).parquet(staging_n)
    # same commit-dst-then-retire order as the postings move above
    spark.read.parquet(staging_n).write.mode("overwrite").parquet(
        f"{paths.norms}/segment_id={int(dst_segment)}"
    )
    for s in srcs:
        if s != dst_segment:
            _delete_path(spark, f"{paths.norms}/segment_id={s}")
    _delete_path(spark, staging_n)

    # dst inherits the MIN src build_avgdl (wand takes the per-segment
    # min, so the inflation factor stays an upper bound whether or not
    # the blocks were re-encoded at the current avgdl)

    mn = None
    manifest = read_or_none(spark, paths.manifest)
    if manifest is not None:
        mn = (
            manifest.filter(F.col("segment_id").isin(srcs) & F.col("build_avgdl").isNotNull())
            .agg(F.min("build_avgdl"))
            .collect()[0][0]
        )
    if compact:
        # ragged tails were re-encoded at the CURRENT avgdl while full
        # blocks passed through at their src build avgdl — the recorded
        # encoding avgdl must be the min over BOTH so the query-time
        # inflation factor max(1, avgdl_now/build_avgdl) stays an upper
        # bound after later upward drift.
        mn = avgdl if mn is None else min(float(mn), avgdl)

    if purge_df is not None:
        _purge_docs_and_stats(spark, paths, purge_df, srcs)
    elif purge_segs := sorted(
        set(srcs) & {int(x) for x in _live_tombstone_segments(spark, paths)}
    ):
        # merge WITHOUT purge: postings (and norms) moved to dst, so the
        # src segments' tombstones must re-home under the dst partition
        # or later purges and per-segment liveness reads would miss them
        stage_t = f"{paths.root}/tombstones_rehome_tmp"
        _delete_path(spark, stage_t)
        (
            spark.read.parquet(paths.tombstones)
            .filter(F.col("segment_id").isin(purge_segs))
            .select("doc_id")
            .write.mode("overwrite")
            .parquet(stage_t)
        )
        staged = read_or_none(spark, stage_t)
        for s in purge_segs:
            _delete_path(spark, f"{paths.tombstones}/segment_id={int(s)}")
        if staged is not None:
            staged.withColumn("segment_id", F.lit(int(dst_segment))).write.mode(
                "append"
            ).partitionBy("segment_id").parquet(paths.tombstones)
        _delete_path(spark, stage_t)
    _delete_path(spark, purge_stage)

    append_manifest(
        spark,
        paths,
        [
            {
                "segment_id": int(dst_segment),
                "stage": "merge",
                "status": "done",
                "n_terms": n_terms,
                "n_postings": n_postings,
                "bytes": nbytes,
                "started_at": started,
                "build_avgdl": float(mn) if mn is not None else None,
            }
        ]
        + [{"segment_id": s, "stage": "merge", "status": "merged"} for s in srcs if s != dst_segment],
    )
    # a purge may have removed vocabulary/docs; drop the optional
    # dictionary and tier-index sidecars (rebuilt on next use — stale
    # copies would silently miss or resurrect docs)
    if purge_df is not None:
        _delete_path(spark, paths.term_dict)
        _delete_path(spark, paths.tier_index)
        _delete_path(spark, paths.tier_meta)
    from .wand import refresh_meta

    refresh_meta(index_dir)
    return int(dst_segment)
