"""Structured-response parsers (F5/F6) as set-at-a-time DataFrame ops.

Mirrors /root/reference/02_src/vlm_ocr_doc_reader/core/ocr_client.py:89-171:
the reference parses one model response at a time with Python regexes; the
engine parses a whole column of responses with the same regexes compiled by
the JVM (regexp_extract), and turns the block/index alignment into a
posexplode + outer join on the expected index frame (SURVEY F6/J3) — missing
blocks become explicit error rows instead of silent misalignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Java-regex twins of ocr_client.py:89-100 ((?s) == re.DOTALL)
TASK_BLOCK_RE = r"(?s)\[ЗАДАЧА\s+\d+\].*?(?=\[ЗАДАЧА\s+\d+\]|$)"
TASK_IDX_RE = r"\[ЗАДАЧА\s+(\d+)\]"
VALUE_RE = r"(?s)ЗНАЧЕНИЕ:\s*(.+?)(?=\n\s*КОНТЕКСТ:|\n\s*ПОЯСНЕНИЕ:|$)"
CONTEXT_RE = r"(?s)КОНТЕКСТ:\s*(.+?)(?=\n\s*ПОЯСНЕНИЕ:|$)"
EXPLAIN_RE = r"(?s)ПОЯСНЕНИЕ:\s*(.+)"
DIGIT_LIKE_RE = r"^[\d\s\-\.]+$"

PARSED_FIELDS = ("status", "value", "context", "explanation")


def parse_single_expr(text: Column) -> Column:
    """F5 (ocr_client.py:103-134): one ЗНАЧЕНИЕ/КОНТЕКСТ/ПОЯСНЕНИЕ block ->
    struct(status, value, context, explanation)."""
    t = F.coalesce(text, F.lit(""))
    value_raw = F.trim(F.regexp_extract(t, VALUE_RE, 1))
    context = F.trim(F.regexp_extract(t, CONTEXT_RE, 1))
    explanation = F.trim(F.regexp_extract(t, EXPLAIN_RE, 1))
    stripped = F.trim(t)

    digit_fallback = ((value_raw == "") & (stripped != "")
                      & stripped.rlike(DIGIT_LIKE_RE))
    no_data = (F.upper(value_raw) == "НЕТ") | (value_raw == "-") \
        | (value_raw == "")

    return (F.when(digit_fallback,
                   F.struct(F.lit("ok").alias("status"),
                            stripped.alias("value"),
                            F.lit("").alias("context"),
                            F.lit("fallback").alias("explanation")))
             .when(no_data,
                   F.struct(F.lit("no_data").alias("status"),
                            F.lit("").alias("value"),
                            context.alias("context"),
                            explanation.alias("explanation")))
             .otherwise(
                 F.struct(F.lit("ok").alias("status"),
                          value_raw.alias("value"),
                          context.alias("context"),
                          explanation.alias("explanation"))))


def parse_multi_task(responses: DataFrame, id_cols: list[str],
                     text_col: str = "response",
                     expected_col: str = "expected") -> DataFrame:
    """F6 (ocr_client.py:137-171): split each response into [ЗАДАЧА N]
    blocks and align them to the expected index frame 1..expected.

    Semantics mirrored exactly: out-of-range indices ignored, duplicate
    indices -> last block wins, missing -> error row, single-task responses
    may omit the header entirely (fallback parses the whole text).

    Output: id_cols + (task_idx, status, value, context, explanation).
    """
    ids = [F.col(c) for c in id_cols]

    blocks = (responses
              .select(*ids, F.col(expected_col).alias("_exp"),
                      F.posexplode_outer(
                          F.regexp_extract_all(F.col(text_col),
                                               F.lit(TASK_BLOCK_RE), 0))
                       .alias("_pos", "_block"))
              .withColumn("task_idx",
                          F.regexp_extract(F.col("_block"), TASK_IDX_RE, 1)
                           .cast("int"))
              .filter(F.col("task_idx").isNotNull()
                      & (F.col("task_idx") >= 1)
                      & (F.col("task_idx") <= F.col("_exp"))))
    # duplicate idx: last occurrence wins (dict overwrite, ocr_client.py:152)
    w = Window.partitionBy(*id_cols, "task_idx").orderBy(F.desc("_pos"))
    parsed = (blocks.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .withColumn("_body",
                          F.regexp_replace(F.col("_block"), TASK_IDX_RE, ""))
              .select(*ids, "task_idx",
                      parse_single_expr(F.col("_body")).alias("p")))

    expected = (responses
                .select(*ids, F.col(text_col).alias("_txt"),
                        F.col(expected_col).alias("_exp"))
                .select(*ids, "_txt", "_exp",
                        F.explode(F.sequence(F.lit(1), F.col("_exp")))
                         .alias("task_idx")))

    j = expected.join(parsed, [*id_cols, "task_idx"], "left")
    # single-task fallback: expected == 1 and no [ЗАДАЧА 1] header found
    fallback = (F.col("p").isNull()) & (F.col("_exp") == 1)
    missing = F.struct(
        F.lit("error").alias("status"), F.lit("").alias("value"),
        F.lit("").alias("context"),
        F.format_string("Missing [ЗАДАЧА %d] block in response",
                        F.col("task_idx")).alias("explanation"))
    p = (F.when(fallback, parse_single_expr(F.col("_txt")))
          .when(F.col("p").isNull(), missing)
          .otherwise(F.col("p")))
    return j.select(*ids, "task_idx",
                    p["status"].alias("status"), p["value"].alias("value"),
                    p["context"].alias("context"),
                    p["explanation"].alias("explanation"))
