"""Physical data layout for the landed corpus: directory partitioning +
within-file ordering.

At 100 TB the cheapest query is the one that never reads the bytes; two
layout levers make that happen for parquet (and map 1:1 onto Iceberg
partition specs + sort orders when a catalog is attached —
ARCHITECTURE.md §5):

  * **directory partitioning** (`partitionBy`): a filter on the partition
    column prunes whole directories at PLANNING time — the scan's
    PartitionFilters, visible in `.explain("formatted")`;
  * **within-file sort** (`sortWithinPartitions`): parquet stores min/max
    per row group, so a range filter on the sorted column skips row
    groups at READ time (the PushedFilters path actually eliminates IO
    instead of just filtering rows post-read).

Guardrails this writer enforces:
  * one `repartition` on the partition columns BEFORE `partitionBy`, so
    each output directory is written by few tasks (the default
    task-x-partition fan-out writes `tasks * partitions` small files —
    the classic small-file explosion);
  * low-cardinality partition columns only — callers partitioning by a
    high-cardinality key (doc_id!) get a ValueError instead of a million
    directories (the check costs one countDistinct over the column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_PARTITIONS = 10_000


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: list[str],
                      sort_cols: list[str] | None = None,
                      files_per_partition: int = 1,
                      mode: str = "error",
                      max_partitions: int = MAX_PARTITIONS) -> None:
    """Write ``df`` partitioned by ``partition_cols`` with up to
    ``files_per_partition`` files per directory, rows sorted by
    ``sort_cols`` inside each file."""
    # cardinality guard on the actual COMBINATION count (one aggregate —
    # multiplying per-column distincts would spuriously reject sparse
    # multi-column layouts)
    total = df.select(
        F.countDistinct(F.struct(*partition_cols)).alias("n")) \
        .collect()[0]["n"]
    if total > max_partitions:
        raise ValueError(
            f"write_partitioned: {total} partition directories from "
            f"{partition_cols} exceeds max_partitions={max_partitions}; "
            "partition on a lower-cardinality column (or bucket instead — "
            "sources/bucketing.py)")
    if files_per_partition == 1:
        shaped = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        # hash repartitioning on the partition columns alone routes ALL
        # rows of one partition value to one task (one file) no matter
        # the partition count — a salt column is what actually splits a
        # directory across files
        salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]),
                      F.lit(files_per_partition))
        shaped = (df.withColumn("_fsalt", salt)
                  .repartition(max(1, total) * files_per_partition,
                               *[F.col(c) for c in partition_cols],
                               F.col("_fsalt"))
                  .drop("_fsalt"))
    if sort_cols:
        shaped = shaped.sortWithinPartitions(*partition_cols, *sort_cols)
    shaped.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Plain partition-discovering read; filters on the partition column
    become PartitionFilters (pruned at planning), filters on the sort
    column become row-group-skipping PushedFilters."""
    return spark.read.parquet(path)
