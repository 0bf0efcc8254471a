"""As-of join — the canonical "operator Spark lacks" — as a composition of
built-in ops (no range-join explosion, no UDF).

``asof_join(left, right, ...)``: for every left row, attach the right row
with the greatest ``ts_col`` <= left's (backward as-of, inclusive), matching
on ``on`` keys.  Implementation is the union-and-carry pattern:

  tag both sides -> union -> per-key window ordered by (ts, side) ->
  last(struct(values), ignorenulls) carries the latest right ROW forward
  (the struct marks row presence, so null value fields carry correctly) ->
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
    ``{prefix}{v}`` for each value column (null when no right row is <=).

    The carried unit is ONE struct of all value columns per right row — the
    struct is non-null whenever a right row exists, even if every value
    field in it is null, so (a) a latest-match right row with a NULL value
    correctly yields NULL instead of resurrecting an older non-null value,
    and (b) all carried values come from the SAME right row (per-column
    last(ignorenulls) could mix rows) — matching DuckDB/pandas ASOF
    semantics with NULLs in the right values."""
    from pyspark.sql.types import StructField, StructType

    lcols = list(left.columns)
    rtypes = dict((f.name, f.dataType) for f in right.schema.fields)
    ltypes = dict((f.name, f.dataType) for f in left.schema.fields)
    payload_type = StructType(
        [StructField(v, rtypes[v]) for v in value_cols])

    l2 = (left.withColumn("_side", F.lit(1))
          .withColumn("_rp", F.lit(None).cast(payload_type))
          .withColumn("_rtb", F.lit(None).cast(
              rtypes[right_tiebreak] if right_tiebreak else "int")))

    r2 = right.select(
        *on, F.col(ts_col),
        F.struct(*[F.col(v).alias(v) for v in value_cols]).alias("_rp"),
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
    carried = F.last("_rp", ignorenulls=True).over(w)
    return (u.select(*lcols, F.col("_side"), carried.alias("_c"))
            .filter(F.col("_side") == 1)
            .select(*lcols, *[F.col("_c").getField(v).alias(f"{prefix}{v}")
                              for v in value_cols]))
