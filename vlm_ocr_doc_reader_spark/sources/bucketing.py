"""Bucketed tables: co-located joins without an exchange.

At 100 TB the recurring join key (doc_id for spans/registry/manifest,
orderkey for fact tables) should be bucketed at write time so every
downstream equi-join/aggregation on that key skips the shuffle entirely.
Spark requires ``saveAsTable`` (a metastore entry) for bucketing; this
helper wraps the write and documents the sort-merge-without-exchange plan
the reader should expect (asserted in tests/test_bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 16, sort_col: str | None = None,
                   *more_bucket_cols: str) -> None:
    w = (df.write.mode("overwrite")
         .bucketBy(n_buckets, bucket_col, *more_bucket_cols))
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two tables bucketed on ``key`` — with matching bucket counts the
    planner produces a SortMergeJoin with NO Exchange on either side."""
    return (spark.table(left_table)
            .join(spark.table(right_table), key))


def upsert_bucketed_registry(spark: SparkSession, registry_table: str,
                             updates_table: str,
                             target_table: str | None = None,
                             n_buckets: int = 16) -> DataFrame:
    """Copy-on-write MERGE over bucketed registry tables — the plain-Spark
    stand-in for Iceberg `MERGE INTO registry USING updates ON (doc_id,
    entity_id)` (reference upsert: core/state.py:795-822).

    Both tables are bucketed by the merge key (doc_id, entity_id), so the
    full-outer merge join is co-located: NO Exchange on either side
    (plan-asserted in tests/test_bucketed_merge.py) — at 10^12 registry rows
    the merge cost is one co-partitioned sort-merge pass plus the rewrite of
    touched buckets, never a reshuffle of the registry.  When
    ``target_table`` is given the merged result is written back bucketed the
    same way (next snapshot); the merged frame is returned either way.
    """
    from ..operators.registry import upsert_entries
    merged = upsert_entries(spark.table(registry_table),
                            spark.table(updates_table))
    if target_table:
        write_bucketed(merged, target_table, "doc_id", n_buckets,
                       None, "entity_id")
    return merged
