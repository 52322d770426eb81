"""Bucketed tables for shuffle-free co-located joins.

At 100 TB the repeated join `docs ⋈ <per-doc side table>` (priors,
quality scores, dedup verdicts, session boosts — J1/J6/J9 in SURVEY.md)
must not re-shuffle the big side every time. Bucketing both sides by
the join key at WRITE time pre-co-locates them: Spark's scan reports
the bucket hash-partitioning, and the join plans as a zero-Exchange
SortMergeJoin (tests/test_plans.py asserts the plan has no Exchange).

Parquet bucketing needs a table catalog (`saveAsTable`); locally Spark's
built-in warehouse works out of the box. On Iceberg the equivalent is a
`bucket(N, doc_id)` partition transform + storage-partitioned joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "doc_id",
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist df bucketed (and sorted) by the join key."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str = "doc_id",
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner sees
    matching output partitionings and drops both shuffle Exchanges.
    The merge hint keeps the plan a SortMergeJoin even when one side is
    broadcast-sized (at real scale neither side would be)."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), key, how)
