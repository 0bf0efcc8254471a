"""Batch sessionization (gaps-and-islands) over event streams.

The streaming analog is Spark's native ``session_window`` (used with
watermarks in `streaming/`); this is the batch/backfill form: a new session
starts when the gap to the previous event of the same user exceeds
``gap_minutes``.  Two windows over (user, time) — lag to mark session
starts, running sum to number them — then one hash aggregation; all
Catalyst, exact DuckDB oracle.

Scale shape: both windows and the final groupBy share hashpartitioning
(user_id), so the whole operator is ONE exchange; per-user partitions are
bounded by per-user event counts (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_session_id(events: DataFrame, gap_minutes: int = 30,
                    user_col: str = "user_id", ts_col: str = "ts",
                    tiebreak_col: str = "event_id") -> DataFrame:
    """Attach a per-user ``session_id`` (1-based, in time order).

    The gap comparison runs on fractional epoch seconds (timestamp cast to
    double = microsecond precision) so boundary events land in the same
    session on every engine; the ordering key includes ``tiebreak_col`` to
    pin equal timestamps deterministically.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(F.col(ts_col)).over(w)

    def secs(c):
        # TIMESTAMP_NTZ casts to double only via TIMESTAMP; the session
        # timezone is pinned to UTC (sources/session.py) so this is the
        # naive wall-clock epoch — exactly DuckDB's epoch(ts)
        return c.cast("timestamp").cast("double")

    is_new = F.when(
        prev.isNull()
        | (secs(F.col(ts_col)) - secs(prev) > gap_minutes * 60.0),
        1).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (events.withColumn("_new", is_new)
            .withColumn("session_id", F.sum("_new").over(wcum).cast("int"))
            .drop("_new"))


def session_summary(events: DataFrame, gap_minutes: int = 30,
                    user_col: str = "user_id", ts_col: str = "ts",
                    tiebreak_col: str = "event_id") -> DataFrame:
    """One row per (user, session): start/end timestamps + event count."""
    s = with_session_id(events, gap_minutes, user_col, ts_col, tiebreak_col)
    return (s.groupBy(user_col, "session_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events")))
