"""Structured-Streaming operators: watermarked windowed aggregation and
stateful per-key accumulation (applyInPandasWithState).

Reference analogs: the recency windows of ST5 (src/git-utils.ts:144-183)
become true event-time windows with a watermark for late data; the
session view-count upsert of A13 (src/session-manager.ts:180-213)
becomes a stateful streaming operator whose state survives across
micro-batches and restarts (checkpointed by Spark).

At scale these run against a stream of crawl events / page updates;
tests feed them parquet directories with availableNow triggers (the
same incremental pattern as streaming/incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window counts with a watermark: late events
    within `watermark` still land in their window; older ones are
    dropped and their windows finalized (bounded state)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "cnt", "sum_value")
    )


def _view_count_update(key, pdfs, state):
    """Per-user running totals: the A13 viewCount++ upsert as streaming
    state. State = (view_count, last_us) and survives micro-batches and
    restarts via the stream checkpoint."""
    import pandas as pd

    total, last_us = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        total += len(pdf)
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max()))
    state.update((total, last_us))
    yield pd.DataFrame(
        {"user_id": [key[0]], "view_count": [total], "last_seen_us": [last_us]}
    )


def user_view_counts(events: DataFrame) -> DataFrame:
    """Stateful per-user event counting over a stream —
    applyInPandasWithState (Arrow-batched; state is per-key, so the
    operator shards across executors by user_id)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _view_count_update,
        outputStructType="user_id long, view_count long, last_seen_us long",
        stateStructType="view_count long, last_seen_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
