"""Ordered-funnel analysis over an event stream: for each user, how far
through a required step sequence (view -> click -> purchase, ...) did
they progress, where each step must happen strictly AFTER the previous
one was first reached.

Scale shape: one filtered aggregate per step — step i's frame is
min(ts) over events of that type later than the user's step-(i-1)
timestamp — joined on the user key.  All joins/aggregates share the SAME
equi key, so after the first hash exchange the subsequent stages reuse
the partitioning (co-located); k steps never re-shuffle the raw events.
Deterministic (min over timestamps), so exactly SQL-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(events: DataFrame, steps: list[str],
                 user_col: str = "user_id",
                 type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """(user, t_1..t_k timestamps, reached int): t_i is the user's FIRST
    event of steps[i] strictly after t_{i-1} (t_1 is the plain first
    occurrence); null once a step is never reached, and every later step
    is null too by construction.  ``reached`` counts completed steps —
    the funnel report is one groupBy over it."""
    if len(steps) < 2:
        raise ValueError("funnel_steps: need at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_steps: steps must be distinct")
    base = events.select(F.col(user_col).alias("user"),
                         F.col(type_col).alias("etype"),
                         F.col(ts_col).alias("ts"))
    out = (base.filter(F.col("etype") == steps[0])
           .groupBy("user").agg(F.min("ts").alias("t_1")))
    for i, step in enumerate(steps[1:], start=2):
        nxt = (base.filter(F.col("etype") == step)
               .join(out.select("user", F.col(f"t_{i - 1}").alias("_prev")),
                     "user")
               .filter(F.col("ts") > F.col("_prev"))
               .groupBy("user").agg(F.min("ts").alias(f"t_{i}")))
        out = out.join(nxt, "user", "left")
    reached = None
    for i in range(len(steps), 0, -1):
        c = F.col(f"t_{i}").isNotNull()
        reached = F.when(c, i) if reached is None else \
            reached.when(c, i)
    return out.withColumn("reached", reached.otherwise(0).cast("int"))


def funnel_report(events: DataFrame, steps: list[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """(step int, step_name, n_users, conversion double): users whose
    funnel reached AT LEAST each step, with conversion relative to step 1.
    The tiny k-row report aggregates the per-user frame once."""
    f = funnel_steps(events, steps, user_col, type_col, ts_col)
    # ONE job computes the whole per-user funnel; the result of the
    # groupBy is at most len(steps) rows, so the cumulative "reached at
    # least step i" report is assembled driver-side from that tiny
    # aggregate instead of re-running the join-aggregate chain once per
    # step (which Catalyst would do — the counts frame is unpersisted, so
    # each .filter lineage re-executed the funnel; r4 advice)
    by_step = {int(r["reached"]): int(r["n"])
               for r in (f.groupBy("reached").agg(F.count("*").alias("n"))
                         .filter(F.col("reached") >= 1).collect())}
    cum, total = {}, 0
    for i in range(len(steps), 0, -1):
        total += by_step.get(i, 0)
        cum[i] = total
    spark = events.sparkSession
    rows = [(i, name, cum[i]) for i, name in enumerate(steps, start=1)]
    rep = spark.createDataFrame(
        rows, "step int, step_name string, n_users bigint")
    n1 = cum[1]
    # conversion rounded Spark-side (HALF_UP) so the formatting rule stays
    # identical to the DuckDB oracle — Python's round() is banker's
    return rep.select(
        "step", "step_name", "n_users",
        F.round(F.col("n_users") / F.lit(n1), 6).alias("conversion")
        if n1 > 0 else F.lit(0.0).alias("conversion"))
