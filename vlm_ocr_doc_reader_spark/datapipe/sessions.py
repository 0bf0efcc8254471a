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


def time_rollup(events: DataFrame, levels: tuple[str, ...] = ("hour", "day"),
                ts_col: str = "ts", key_col: str = "event_type",
                value_col: str = "value") -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the finest level
    aggregates the raw events ONCE; every coarser level re-aggregates the
    previous level (sums of sums), never rescanning raw data — the
    TimescaleDB continuous-aggregate pattern as a Spark DAG.

    Output: (level, bucket timestamp, key, n_events, sum_value), one row
    per bucket per key per level.  At 100 TB the raw scan happens once and
    each rollup shuffles only the (tiny) previous level.

    Determinism: the value column is cast per-row to DECIMAL(18,6) before
    the first aggregation, so every level's sum is EXACT decimal
    arithmetic — associative, hence invariant to partition count and
    partial-sum order.  A double sum here is order-dependent, and the
    two-level sums-of-sums amplified that into the round-4 driver hash
    mismatch (CORRECTNESS_r04 time_rollup); ``sum_value`` is therefore
    decimal — cast to double downstream if a float schema is needed."""
    finest = levels[0]
    cur = (events.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("bucket"),
        F.col(key_col).alias("key"))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col(value_col).cast("decimal(18,6)"))
              .alias("sum_value"))
        .withColumn("level", F.lit(finest)))
    out = cur
    for lv in levels[1:]:
        cur = (cur.groupBy(
            F.date_trunc(lv, F.col("bucket")).alias("bucket"), "key")
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sum_value").alias("sum_value"))
            .withColumn("level", F.lit(lv)))
        out = out.unionByName(cur)
    return out.select("level", "bucket", "key", "n_events", "sum_value")


def session_summary(events: DataFrame, gap_minutes: int = 30,
                    user_col: str = "user_id", ts_col: str = "ts",
                    tiebreak_col: str = "event_id") -> DataFrame:
    """One row per (user, session): start/end timestamps + event count."""
    s = with_session_id(events, gap_minutes, user_col, ts_col, tiebreak_col)
    return (s.groupBy(user_col, "session_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events")))


def rolling_stats(events: DataFrame, n: int = 5,
                  user_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value",
                  tiebreak_col: str = "event_id") -> DataFrame:
    """Per-event trailing-window features over the previous ``n`` events of
    the same user (the current one included): rolling mean / max / count.
    The feature-engineering staple for behavioral models.

    Scale shape: ONE hash exchange on the user key; the ROWS BETWEEN frame
    is bounded (n), so state per row is O(n) regardless of user history
    length — no unbounded running state, no global sort.

    Determinism: the frame is pinned by (ts, tiebreak) ordering, and the
    rolling mean accumulates the value in exact DECIMAL over the bounded
    frame — identical at any partitioning, exactly mirrorable in SQL."""
    w = (Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
         .rowsBetween(-(n - 1), Window.currentRow))
    dec = F.col(value_col).cast("decimal(18,6)")
    return events.select(
        user_col, tiebreak_col, ts_col, value_col,
        F.count(value_col).over(w).alias("n_window"),
        F.round(F.sum(dec).over(w).cast("double")
                / F.count(value_col).over(w), 6).alias("rolling_mean"),
        F.round(F.max(value_col).over(w), 6).alias("rolling_max"))


def decayed_sum(events: DataFrame, half_life_hours: float = 24.0,
                anchor_ts: str = "2024-07-01 00:00:00",
                user_col: str = "user_id", ts_col: str = "ts",
                value_col: str = "value") -> DataFrame:
    """Exponential-decay aggregate per user: sum(value * 0.5^(age/h))
    where age is measured back from ``anchor_ts`` (an explicit anchor, not
    now(), so results are reproducible).  Recency-weighted activity is the
    standard freshness feature a ranking pipeline derives from an event
    log.

    Scale shape: the decay factor is a narrow per-row expression; the only
    exchange is the final user groupBy with map-side partial aggregation.
    The weighted values accumulate in DECIMAL (the per-row double
    weight*value is cast once, deterministically) so the sum is
    partition-invariant."""
    # age in hours relative to the anchor (events after the anchor get
    # weight > 1 — the formula stays monotone and exact either way)
    age_h = ((F.unix_timestamp(F.lit(anchor_ts)).cast("double")
              - F.col(ts_col).cast("timestamp").cast("double")) / 3600.0)
    weight = F.pow(F.lit(0.5), age_h / F.lit(half_life_hours))
    part = (F.col(value_col) * weight).cast("decimal(20,8)")
    return (events.groupBy(user_col)
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(part).cast("double"), 6)
                  .alias("decayed_value")))
