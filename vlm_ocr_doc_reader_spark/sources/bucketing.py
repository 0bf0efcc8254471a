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
                   n_buckets: int = 16, sort_col: str | None = None) -> None:
    w = (df.write.mode("overwrite")
         .bucketBy(n_buckets, bucket_col))
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two tables bucketed on ``key`` — with matching bucket counts the
    planner produces a SortMergeJoin with NO Exchange on either side."""
    return (spark.table(left_table)
            .join(spark.table(right_table), key))
