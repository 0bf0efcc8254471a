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

import functools
import operator

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

    Output: ``on`` keys + remaining point columns + remaining interval
    columns.  ``how``: 'inner', or 'left'/'left_outer' — a point with no
    containing interval keeps one row with null interval columns.  The
    residual BETWEEN lives in the JOIN CONDITION (not a post-join filter),
    so outer semantics are honest: a point whose chunk has intervals that
    all fail the BETWEEN still survives as an unmatched row (a post-filter
    would silently degrade 'left' to inner).  Other join types are refused
    — the chunk explode duplicates interval rows, so e.g. right/full
    semantics would need dedup the caller must opt into explicitly."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"range_join: how={how!r} not supported "
                         "(use 'inner' or 'left')")
    chunk = F.lit(float(chunk_seconds))
    iv = intervals.withColumn(
        "_chunk",
        F.explode(F.sequence(
            F.floor(_epoch(F.col(start_col)) / chunk).cast("long"),
            F.floor(_epoch(F.col(end_col)) / chunk).cast("long"))))
    pt = points.withColumn(
        "_chunk", F.floor(_epoch(F.col(ts_col)) / chunk).cast("long"))
    p, i = pt.alias("_p"), iv.alias("_i")
    cond = functools.reduce(operator.and_, [p[k] == i[k] for k in on])
    cond = (cond & (p["_chunk"] == i["_chunk"])
            & (_epoch(p[ts_col]) >= _epoch(i[start_col]))
            & (_epoch(p[ts_col]) <= _epoch(i[end_col])))
    j = p.join(i, cond, "inner" if how == "inner" else "left")
    return j.select(
        *[p[k] for k in on],
        *[p[c] for c in points.columns if c not in on],
        *[i[c] for c in intervals.columns if c not in on])
