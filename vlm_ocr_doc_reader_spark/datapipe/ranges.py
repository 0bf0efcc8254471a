"""Range (interval) join — points joined into [start, end] intervals —
without the theta-join cross product.

Naive `ON p.ts BETWEEN i.start AND i.end` compiles to a
BroadcastNestedLoop/cartesian at scale.  The scalable form buckets time into
fixed chunks: every interval explodes into the chunks it covers, every
point lands in exactly one chunk, and the join becomes an EQUI-join on
(key, chunk) plus a residual BETWEEN filter.  A point matches an interval in
exactly one chunk (its own), so no dedup is needed.

Pick ``chunk_seconds`` near the typical interval length: cost is
O(intervals x chunks_per_interval + points) shuffled rows on a
high-cardinality key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch(c: Column) -> Column:
    # TIMESTAMP_NTZ -> TIMESTAMP -> DOUBLE (UTC session tz pinned)
    return c.cast("timestamp").cast("double")


def range_join(points: DataFrame, intervals: DataFrame, on: list[str],
               ts_col: str, start_col: str, end_col: str,
               chunk_seconds: int = 3600, how: str = "inner") -> DataFrame:
    """Join each point row to interval rows with
    start <= ts <= end (inclusive), matching on ``on`` keys.

    Output: all point columns + all interval columns (minus the join keys'
    duplicates).  ``how`` inner or left_semi-style via inner; intervals with
    no points simply produce no rows."""
    chunk = F.lit(float(chunk_seconds))
    iv = intervals.withColumn(
        "_chunk",
        F.explode(F.sequence(
            F.floor(_epoch(F.col(start_col)) / chunk).cast("long"),
            F.floor(_epoch(F.col(end_col)) / chunk).cast("long"))))
    pt = points.withColumn(
        "_chunk", F.floor(_epoch(F.col(ts_col)) / chunk).cast("long"))
    j = pt.join(iv, on + ["_chunk"], how)
    return (j.filter((_epoch(F.col(ts_col)) >= _epoch(F.col(start_col)))
                     & (_epoch(F.col(ts_col)) <= _epoch(F.col(end_col))))
            .drop("_chunk"))
