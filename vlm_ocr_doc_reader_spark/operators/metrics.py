"""Run-quality metrics (SURVEY A8): consistency vs a baseline run.

Mirrors the reference's empirical grid script
(/root/reference/scripts/ocr_chunk_grid.py:138-146): share of entity values
equal to the baseline run's value — the metric the reference used to pick
chunk_size/workers, and the inexact ancestor of our exact golden tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def consistency_vs_baseline(run: DataFrame, baseline: DataFrame,
                            key_cols: list[str],
                            value_col: str = "value") -> DataFrame:
    """Self-join runs on the entity key and report agreement:
    (n_total, n_match, consistency)."""
    r = run.select(*key_cols, F.col(value_col).alias("_run_v"))
    b = baseline.select(*key_cols, F.col(value_col).alias("_base_v"))
    j = r.join(b, key_cols, "inner")
    eq = (F.col("_run_v") == F.col("_base_v")) | \
         (F.col("_run_v").isNull() & F.col("_base_v").isNull())
    return j.agg(
        F.count("*").alias("n_total"),
        F.count_if(eq).alias("n_match"),
        F.round(F.count_if(eq) / F.count("*"), 6).alias("consistency"))
