"""Corpus drift monitors: PSI, two-sample KS, chi-square divergence.

A production training-data pipeline re-ingests a corpus on a cadence
(new crawl, new vendor drop) and must answer "did the distribution
move?" before the new snapshot reaches training.  The three standard
monitors are implemented over two DataFrames of the same shape — a
reference snapshot and a current one:

* **PSI** (population stability index) over a numeric column, binned by
  the REFERENCE snapshot's quantile edges — the industry drift score
  (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 shifted).
* **Two-sample Kolmogorov-Smirnov D** — max ECDF gap, the
  non-parametric location/shape test.
* **Chi-square divergence** over a categorical column — per-category
  observed-vs-expected drift with the summed statistic.

Cross-engine exactness (gate-oracle-ready, r7 window): every monitor is
counts-only rational arithmetic until one final rounded division/log —
the only interpolated floats are PSI's bin edges, which are rounded to
6 decimals BEFORE bin assignment on both engines (the
``curriculum_buckets`` idiom; guards the r4 time_rollup last-ulp class).

Scale shape (100 TB): each snapshot is reduced to a per-bin /
per-category / per-distinct-value count FIRST (map-side-combinable hash
aggregates — the only shuffles of full data), and all statistics run on
the tiny reduced frames.  PSI broadcasts an n-1-element edge array
(one reduced row); KS's cumulative window runs over distinct values of
the reduced counts frame, not rows; chi-square joins two category-count
frames.  Nothing re-shuffles the corpus, nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _binned_counts(df: DataFrame, col: str,
                   edges_df: DataFrame) -> DataFrame:
    """(bin, n) counts for ``col`` against broadcast quantile edges.
    bin = number of (rounded) edges strictly below the value — a pure
    row function, identical at any partitioning."""
    bucket = F.aggregate(
        F.col("_edges"), F.lit(0),
        lambda acc, e: acc
        + F.when(F.col(col) > F.round(e, 6), 1).otherwise(0))
    return (df.filter(F.col(col).isNotNull())
            .crossJoin(F.broadcast(edges_df))
            .withColumn("bin", bucket.cast("int"))
            .groupBy("bin").agg(F.count("*").alias("n")))


def psi(df_ref: DataFrame, df_cur: DataFrame, col: str,
        n_bins: int = 10) -> DataFrame:
    """Population stability index of ``col``: current vs reference.

    Output: one row per bin — (bin, n_ref, n_cur, p_ref, p_cur,
    psi_term) — plus the roll-up is one `sum(psi_term)` away; emitting
    per-bin terms keeps the result explainable (WHICH bins moved).
    Bins the REFERENCE's n_bins-quantile edges (rounded to 6dp before
    assignment, both engines).  Proportions are Laplace-smoothed
    ((n+1)/(N+bins)) so an empty bin contributes a finite term instead
    of ln(0) — smoothing keeps everything rational on integer counts.
    Bins with zero rows in BOTH snapshots still appear (the edge frame
    generates 0..n_bins keys) so the output row count is fixed.
    """
    if n_bins < 2:
        raise ValueError("psi: need n_bins >= 2")
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = df_ref.agg(F.expr(
        f"percentile({col}, array({', '.join(map(str, qs))}))")
        .alias("_edges"))
    ref_c = _binned_counts(df_ref, col, edges)
    cur_c = _binned_counts(df_cur, col, edges)
    bins = (edges.select(F.posexplode(
        F.array(*[F.lit(i) for i in range(n_bins)])).alias("bin", "_x"))
        .select("bin"))
    ref_tot = (df_ref.filter(F.col(col).isNotNull())
               .agg(F.count("*").alias("t_ref")))
    cur_tot = (df_cur.filter(F.col(col).isNotNull())
               .agg(F.count("*").alias("t_cur")))
    joined = (bins
              .join(ref_c.withColumnRenamed("n", "n_ref"), "bin", "left")
              .join(cur_c.withColumnRenamed("n", "n_cur"), "bin", "left")
              .crossJoin(F.broadcast(ref_tot))
              .crossJoin(F.broadcast(cur_tot))
              .select("bin",
                      F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                      F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
                      "t_ref", "t_cur"))
    p_ref = (F.col("n_ref") + 1) / (F.col("t_ref") + n_bins)
    p_cur = (F.col("n_cur") + 1) / (F.col("t_cur") + n_bins)
    return (joined
            .withColumn("p_ref", F.round(p_ref, 6))
            .withColumn("p_cur", F.round(p_cur, 6))
            .withColumn("psi_term",
                        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6))
            .drop("t_ref", "t_cur")
            .orderBy("bin"))


def ks_statistic(df_a: DataFrame, df_b: DataFrame, col: str,
                 max_points: int | None = 2_000_000) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D for ``col``: one row
    (n_a, n_b, d_stat).

    Each side reduces to per-distinct-value counts (the corpus-sized
    hash aggregate), the two count frames full-outer-merge on value,
    and ONE cumulative window over the merged distinct values yields
    both ECDFs; D = max |cum_a/n_a - cum_b/n_b|.  The window's global
    ordering runs over distinct values, not rows — for a metric column
    that is thousands of points, not billions.  ECDF gaps are exact
    rationals on integer counts; only the final max is rounded.

    ``max_points`` guards that premise (the ``write_partitioned``
    cardinality-refusal idiom): the cumulative window is a single
    partition by construction, so a CONTINUOUS high-cardinality column
    (raw doubles, timestamps) would funnel its whole distinct-value set
    through one task.  If the merged distinct count exceeds the bound
    the call raises with the remediation — round/bin the column first
    (``F.round(col, 3)`` changes D by at most the bin mass) — instead
    of silently degrading.  ``None`` disables the check (one count job
    saved when the caller knows the column is discrete).
    """
    from pyspark.sql import Window

    a_c = (df_a.filter(F.col(col).isNotNull())
           .groupBy(F.col(col).alias("v")).agg(F.count("*").alias("ca")))
    b_c = (df_b.filter(F.col(col).isNotNull())
           .groupBy(F.col(col).alias("v")).agg(F.count("*").alias("cb")))
    if max_points is not None:
        n_distinct = a_c.select("v").union(b_c.select("v")) \
            .distinct().count()
        if n_distinct > max_points:
            raise ValueError(
                f"ks_statistic: {col!r} has {n_distinct} distinct values "
                f"(> max_points={max_points}); the exact-ECDF cumulative "
                f"window is single-partition, so bin the column first "
                f"(e.g. F.round({col!r}, k)) or raise/disable max_points "
                f"if the skew is acceptable")
    merged = (a_c.join(b_c, "v", "full_outer")
              .select("v", F.coalesce("ca", F.lit(0)).alias("ca"),
                      F.coalesce("cb", F.lit(0)).alias("cb")))
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    cum = merged.select(
        F.sum("ca").over(w_cum).alias("cum_a"),
        F.sum("cb").over(w_cum).alias("cum_b"),
        F.sum("ca").over(w_all).alias("n_a"),
        F.sum("cb").over(w_all).alias("n_b"))
    return cum.agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.round(F.max(F.abs(F.col("cum_a") / F.col("n_a")
                            - F.col("cum_b") / F.col("n_b"))), 6)
        .alias("d_stat"))


def chi_square_drift(df_ref: DataFrame, df_cur: DataFrame,
                     col: str) -> DataFrame:
    """Per-category chi-square drift of categorical ``col``.

    Output: (category, n_ref, n_cur, expected_cur, chi2_term) ordered
    by category, where expected_cur scales the reference proportion to
    the current total and chi2_term = (n_cur - expected)^2 / expected.
    Categories absent from the reference get Laplace-smoothed expected
    counts ((n_ref+1) over the smoothed total) so a brand-new category
    registers as drift instead of a division by zero; all arithmetic is
    rational on integer counts until the final rounded terms.
    Total statistic = sum(chi2_term) — left per-category for
    explainability, same convention as :func:`psi`.
    """
    ref_c = (df_ref.filter(F.col(col).isNotNull())
             .groupBy(F.col(col).alias("category"))
             .agg(F.count("*").alias("n_ref")))
    cur_c = (df_cur.filter(F.col(col).isNotNull())
             .groupBy(F.col(col).alias("category"))
             .agg(F.count("*").alias("n_cur")))
    merged = (ref_c.join(cur_c, "category", "full_outer")
              .select("category",
                      F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                      F.coalesce("n_cur", F.lit(0)).alias("n_cur")))
    totals = merged.agg(
        F.count("*").alias("k"),
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"))
    expected = ((F.col("n_ref") + 1)
                / (F.col("t_ref") + F.col("k")) * F.col("t_cur"))
    return (merged
            .crossJoin(F.broadcast(totals))
            .withColumn("expected_cur", F.round(expected, 6))
            .withColumn("chi2_term",
                        F.round((F.col("n_cur") - expected) ** 2
                                / expected, 6))
            .select("category", "n_ref", "n_cur", "expected_cur",
                    "chi2_term")
            .orderBy("category"))
