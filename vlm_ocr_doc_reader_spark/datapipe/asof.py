"""As-of join — the canonical "operator Spark lacks" — as a composition of
built-in ops (no range-join explosion, no UDF).

``asof_join(left, right, ...)``: for every left row, attach the right row
with the greatest ``ts_col`` <= left's (backward as-of, inclusive), matching
on ``on`` keys.  Implementation is the union-and-carry pattern:

  tag both sides -> union -> per-key window ordered by (ts, side) ->
  last(value, ignorenulls) carries the latest right value forward ->
  keep left rows.

Scale shape: ONE exchange on the key columns (window partitioning); no
theta/range join ever forms, so a hot key costs a per-key sort, not a
cross product.  Equal timestamps: the right row sorts first (side 0 < 1),
making the match inclusive; ties BETWEEN right rows are broken by
``right_tiebreak`` so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              ts_col: str, value_cols: list[str],
              right_tiebreak: str | None = None,
              prefix: str = "asof_") -> DataFrame:
    """Backward inclusive as-of join.  Output: all left columns plus
    ``{prefix}{v}`` for each value column (null when no right row is <=)."""
    lcols = list(left.columns)
    rtypes = dict((f.name, f.dataType) for f in right.schema.fields)
    ltypes = dict((f.name, f.dataType) for f in left.schema.fields)

    l2 = left.withColumn("_side", F.lit(1))
    for v in value_cols:
        l2 = l2.withColumn(f"_r_{v}", F.lit(None).cast(rtypes[v]))
    l2 = l2.withColumn("_rtb", F.lit(None).cast(
        rtypes[right_tiebreak] if right_tiebreak else "int"))

    r2 = right.select(
        *on, F.col(ts_col),
        *[F.col(v).alias(f"_r_{v}") for v in value_cols],
        (F.col(right_tiebreak) if right_tiebreak else F.lit(None).cast("int"))
        .alias("_rtb"))
    for c in lcols:
        if c not in on and c != ts_col:
            r2 = r2.withColumn(c, F.lit(None).cast(ltypes[c]))
    r2 = r2.withColumn("_side", F.lit(0))

    u = l2.unionByName(r2.select(*l2.columns))
    w = (Window.partitionBy(*on)
         .orderBy(F.col(ts_col).asc(), F.col("_side").asc(),
                  F.col("_rtb").asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(f"_r_{v}", ignorenulls=True).over(w)
               .alias(f"{prefix}{v}") for v in value_cols]
    return (u.select(*lcols, F.col("_side"), *carried)
            .filter(F.col("_side") == 1)
            .drop("_side"))
