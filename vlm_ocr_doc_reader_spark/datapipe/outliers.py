"""Robust outlier detection: modified z-scores from median/MAD.

Corpus anomaly screening (aberrant document lengths, metric spikes per
source/type) needs statistics a heavy tail can't drag around — mean/std
break down under exactly the contamination being hunted; median and MAD
(median absolute deviation) have a 50% breakdown point.  The modified
z-score z = 0.6745 (x - med) / MAD with the conventional |z| > 3.5 flag
is the standard Iglewicz-Hoaglin screen.

Scale shape: two exact-percentile aggregates on the group key (median,
then MAD over the residuals — `percentile` sorts within each group's
aggregation buffer, fine for bounded groups; unbounded groups swap in
``sketches.histogram_quantiles`` at one-bin-width precision) and two
broadcast joins of the tiny per-group stats frame back to the rows —
rows never shuffle.  Exact arithmetic end-to-end, so the operator is
DuckDB-oracled (Spark `percentile` == DuckDB `quantile_cont`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_CONSISTENCY = 0.6745  # Phi^-1(0.75): makes MAD consistent with sigma


def robust_outliers(df: DataFrame, col: str,
                    group_cols: list[str] | None = None,
                    threshold: float = 3.5,
                    flagged_only: bool = False) -> DataFrame:
    """Input rows + (med, mad, robust_z, is_outlier) for ``col`` within
    each group.  MAD == 0 (over half the group identical) yields null z
    and is_outlier = false — a degenerate group flags nothing rather than
    everything.  ``flagged_only`` returns just the outlier rows."""
    groups = group_cols or []
    x = F.col(col).cast("double")
    base = df.filter(x.isNotNull())

    med_agg = base.groupBy(*groups).agg(
        F.expr(f"percentile({col}, 0.5)").alias("med"))
    with_med = (base.join(F.broadcast(med_agg), groups) if groups
                else base.crossJoin(F.broadcast(med_agg)))
    mad_agg = (with_med
               .withColumn("_absdev", F.abs(x - F.col("med")))
               .groupBy(*groups)
               .agg(F.expr("percentile(_absdev, 0.5)").alias("mad")))
    stats = med_agg.join(mad_agg, groups) if groups \
        else med_agg.crossJoin(mad_agg)
    scored = (base.join(F.broadcast(stats), groups) if groups
              else base.crossJoin(F.broadcast(stats)))
    z = F.when(F.col("mad") > 0,
               F.lit(MAD_CONSISTENCY) * (x - F.col("med")) / F.col("mad"))
    out = (scored
           .withColumn("robust_z", F.round(z, 6).cast("double"))
           .withColumn("is_outlier",
                       F.coalesce(F.abs(F.col("robust_z"))
                                  > threshold, F.lit(False)))
           .withColumn("med", F.round("med", 6))
           .withColumn("mad", F.round("mad", 6)))
    return out.filter(F.col("is_outlier")) if flagged_only else out


def winsorized_stats(df: DataFrame, col: str,
                     group_cols: list[str] | None = None,
                     lo: float = 0.05, hi: float = 0.95) -> DataFrame:
    """Per-group winsorized summary: clamp ``col`` to its [lo, hi]
    quantiles, then report n, the clamp bounds, and the winsorized mean —
    the heavy-tail-safe location estimate reporting pipelines quote when
    median alone hides spread.

    Output: (group..., n, p_lo, p_hi, win_mean).

    Scale shape: one exact-percentile aggregate per group (same engine
    note as ``robust_outliers``), one broadcast join of the tiny bounds
    frame back onto the rows, one final hash aggregate — rows shuffle
    once, for the group key.  The clamped values accumulate in DECIMAL so
    the mean is partition-invariant (clamping makes values bounded, so
    the decimal cast is always exact-in-range).

    The quantile bounds are rounded to 6 decimals BEFORE clamping (and the
    oracle does the same): Spark ``percentile`` and DuckDB ``quantile_cont``
    both linearly interpolate but can disagree in the last ulp, and an
    unrounded bound feeds every clamped value — the same cross-engine
    rounding-boundary class as the r4 time_rollup incident."""
    groups = group_cols or []
    x = F.col(col).cast("double")
    base = df.filter(x.isNotNull())
    bounds = base.groupBy(*groups).agg(
        F.round(F.expr(f"percentile({col}, {lo})"), 6).alias("p_lo"),
        F.round(F.expr(f"percentile({col}, {hi})"), 6).alias("p_hi"))
    joined = (base.join(F.broadcast(bounds), groups) if groups
              else base.crossJoin(F.broadcast(bounds)))
    clamped = F.least(F.greatest(x, F.col("p_lo")), F.col("p_hi"))
    return (joined.groupBy(*groups)
            .agg(F.count("*").alias("n"),
                 F.round(F.min("p_lo"), 6).alias("p_lo"),
                 F.round(F.min("p_hi"), 6).alias("p_hi"),
                 F.round(F.sum(clamped.cast("decimal(18,6)"))
                          .cast("double") / F.count("*"), 6)
                  .alias("win_mean")))
