"""Change-history shaping: slowly-changing-dimension (type 2) tables from
an append-only change log.

The lakehouse companion to the engine's upsert/merge operator
(operators/registry.py J1): MERGE keeps only the latest row per key;
``scd2_history`` keeps them ALL, as validity intervals — the shape
feature stores and audit tables want ("what was this user's plan on
March 3rd?").

Scale shape: one hash exchange on the business key; both windows (the
change-collapse lag and the interval lead) share that partitioning, so
the whole build is a single shuffle.  No global sort, no driver state —
at 100 TB this is the same cost as any keyed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(log: DataFrame, key_col: str = "user_id",
                 ts_col: str = "ts", value_col: str = "event_type",
                 tiebreak_col: str = "event_id",
                 collapse_unchanged: bool = True) -> DataFrame:
    """Build SCD-2 validity intervals from a change log.

    Output: (key, value, valid_from, valid_to, is_current) — one row per
    VALUE EPISODE: ``valid_from`` is the first time the key took this
    value, ``valid_to`` the instant the next (different) value arrived
    (null while current, the half-open [from, to) convention).

    ``collapse_unchanged``: drop log entries that repeat the previous
    value (a no-op change extends the episode instead of splitting it) —
    set False to keep one interval per raw log row.

    Ordering is pinned by (ts, tiebreak) so equal-timestamp changes
    resolve identically on every engine/partitioning.
    """
    df = log.select(F.col(key_col).alias("key"),
                    F.col(ts_col).alias("ts"),
                    F.col(value_col).alias("value"),
                    F.col(tiebreak_col).alias("_tb"))
    # one window spec reused by the collapse lag AND the interval lead —
    # both share the same hash partitioning, so the build stays a single
    # exchange (plan-asserted in test_plan_shape)
    w = Window.partitionBy("key").orderBy("ts", "_tb")
    if collapse_unchanged:
        df = (df.withColumn("_prev", F.lag("value").over(w))
              .filter(F.col("_prev").isNull()
                      | (F.col("_prev") != F.col("value"))
                      | F.col("value").isNull())
              .drop("_prev"))
    nxt = F.lead("ts").over(w)
    return (df.select(
        "key", "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"))
        .withColumnRenamed("key", key_col))
