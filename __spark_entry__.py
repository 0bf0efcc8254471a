"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship main-content extraction query on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 plus the training-data ops (dedup, ANN, text stats,
scrubbing, sessionization, as-of/range joins, rollups).  EVERY query has an
exact DuckDB oracle — there are no rows-only entries; the golden pytest
suite additionally enforces the judged span-sequence invariant.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vlm_ocr_doc_reader_spark.contract import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: main-content extraction (classify + order) over sentence
    spans derived from the sf0.001 documents table."""
    return QUERIES["extract_text"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
