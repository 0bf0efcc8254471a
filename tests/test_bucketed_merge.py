"""Bucketed registry MERGE: co-located full-outer upsert with NO Exchange
on either side (the plain-Spark stand-in for Iceberg MERGE INTO)."""

import pyspark.sql.functions as F

from vlm_ocr_doc_reader_spark.operators.registry import upsert_entries
from vlm_ocr_doc_reader_spark.sources.bucketing import (
    upsert_bucketed_registry, write_bucketed)

_REG_SCHEMA = ("doc_id string, page_num int, entity_id string, "
               "prompt string, resolution int, value string, "
               "context string, verified boolean, confidence string")


def _reg_rows(n, res=0, val=None):
    return [(f"d{i % 7}", 1 + i % 3, f"e{i}", f"p{i}", res, val,
             None, False, None) for i in range(n)]


def test_bucketed_merge_no_exchange_and_correct(spark):
    reg = spark.createDataFrame(_reg_rows(200), _REG_SCHEMA)
    upd = spark.createDataFrame(
        _reg_rows(80, res=1, val="v"), _REG_SCHEMA).union(
        spark.createDataFrame(
            [("dX", 9, "eNEW", "pNEW", 1, "nv", None, False, None)],
            _REG_SCHEMA))
    try:
        write_bucketed(reg, "t_reg", "doc_id", 8, None, "entity_id")
        write_bucketed(upd, "t_upd", "doc_id", 8, None, "entity_id")

        merged = upsert_bucketed_registry(spark, "t_reg", "t_upd")
        plan = merged._sc._jvm.PythonSQLUtils.explainString(
            merged._jdf.queryExecution(), "formatted")
        assert "Exchange" not in plan, "bucketed merge must be co-located"
        assert "SortMergeJoin" in plan

        # values identical to the unbucketed upsert
        want = sorted(map(tuple, upsert_entries(reg, upd).collect()))
        got = sorted(map(tuple, merged.collect()))
        assert got == want
        assert len(got) == 201            # 200 existing + 1 new key
        updated = [r for r in got if r[4] == 1]
        assert len(updated) == 81         # 80 matched updates + 1 insert
    finally:
        spark.sql("DROP TABLE IF EXISTS t_reg")
        spark.sql("DROP TABLE IF EXISTS t_upd")
