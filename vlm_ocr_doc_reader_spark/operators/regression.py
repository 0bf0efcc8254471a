"""Extraction regression diff: span-sequence comparison of two runs.

The judged per-row invariant of this engine is span-sequence equality
on (kind, text, media_ref, order) per doc_id (reference parity:
the golden suite asserts it against `extraction.oracle.extract_doc`).
``extraction_diff`` computes that invariant AT SCALE between two
extraction outputs — the tool an operator reaches for before rolling a
new extractor version over 10^12 documents: run both versions on a
sample tier, diff, and read exactly which documents diverge and where.

Scale shape: span arrays reduce to comparison keys with a NARROW
per-row transform (offsets are dropped — renumbering is not a
regression; ORDER is the array order); the only exchange is the
full-outer join on doc_id, which co-partitions both runs on the same
key.  Comparison is one zip_with + array_position per row — no
explode, the span payloads never shuffle beyond the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extraction_diff(a: DataFrame, b: DataFrame, id_col: str = "doc_id",
                    spans_col: str = "spans") -> DataFrame:
    """Per-document diff of two extraction runs with nested
    ``spans: array<struct<kind,text,media_ref,offset>>`` columns.

    Output one row per doc_id in either run:
      * status     — 'equal' | 'diverged' | 'only_a' | 'only_b'
      * n_a, n_b   — span counts (null for the missing side)
      * first_diff — 0-based index of the first differing span
                     (null when equal; a pure length mismatch points at
                     the shorter run's length — the padded tail is the
                     first difference)

    Spans compare null-safely on (kind, text, media_ref) in array
    order; a doc present in only one run reports only_a/only_b rather
    than being silently dropped (full-outer join)."""
    def keys(col):
        return F.transform(F.col(col), lambda s: F.struct(
            s["kind"].alias("kind"), s["text"].alias("text"),
            s["media_ref"].alias("media_ref")))

    na = a.select(F.col(id_col).alias(id_col), keys(spans_col).alias("sa"))
    nb = b.select(F.col(id_col).alias(id_col), keys(spans_col).alias("sb"))
    j = na.join(nb, id_col, "full_outer")
    # zip_with pads the shorter array with nulls up to the longer
    # length, and eqNullSafe(null, struct) is false — so a length
    # mismatch surfaces as the first padded position differing
    eq = F.zip_with("sa", "sb", lambda x, y: x.eqNullSafe(y))
    first_bad = F.array_position(eq, F.lit(False))  # 1-based; 0 = none
    status = (F.when(F.col("sa").isNull(), F.lit("only_b"))
              .when(F.col("sb").isNull(), F.lit("only_a"))
              .when(first_bad == 0, F.lit("equal"))
              .otherwise(F.lit("diverged")))
    return j.select(
        id_col,
        status.alias("status"),
        F.when(F.col("sa").isNotNull(), F.size("sa")).cast("int")
         .alias("n_a"),
        F.when(F.col("sb").isNotNull(), F.size("sb")).cast("int")
         .alias("n_b"),
        F.when(F.col("sa").isNotNull() & F.col("sb").isNotNull()
               & (first_bad > 0), first_bad - 1).cast("int")
         .alias("first_diff"))


def extraction_diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n_docs) rollup of an ``extraction_diff`` result — the
    one-look regression verdict (all 'equal' = safe to roll).  Four-row
    output, map-side combinable aggregate."""
    return (diff.groupBy("status")
            .agg(F.count("*").cast("long").alias("n_docs")))
