"""Deterministic chunking windows (W1/W2/W3).

The reference slices per-page registry entries into chunks of ``chunk_size``
(core/reader.py:300-308) and pages into scan batches of ``batch_size``
(core/reader.py:148-149) with Python ``range`` slicing over insertion order.
The engine pins an explicit deterministic sort key (SURVEY §7 hard part #1)
and buckets with a row_number window — one shuffle on the partition key,
then pure arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_within(df: DataFrame, partition_cols: list[str],
                 order_col: str, chunk_size: int,
                 chunk_col: str = "chunk_id",
                 pos_col: str = "task_num") -> DataFrame:
    """Assign ``chunk_col`` (0-based bucket of ``chunk_size`` rows) and
    ``pos_col`` (1-based position within the chunk — W3's task numbering,
    ocr_client.py:232) within each partition, ordered by ``order_col``."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    rn = F.row_number().over(w)
    return (df.withColumn("_rn", rn)
              .withColumn(chunk_col,
                          F.floor((F.col("_rn") - 1) / chunk_size).cast("int"))
              .withColumn(pos_col,
                          ((F.col("_rn") - 1) % chunk_size + 1).cast("int"))
              .drop("_rn"))
