"""As-of join (datapipe/asof.py): hand-computed matches, inclusive equal-ts
semantics, no-match nulls, and the one-exchange/no-range-join plan shape."""

import re

from vlm_ocr_doc_reader_spark.datapipe.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", 10, "a"), (2, "u1", 20, "b"), (3, "u1", 5, "c"),
         (4, "u2", 50, "d"), (5, "u3", 9, "e")],
        "event_id int, k string, ts int, payload string")
    right = spark.createDataFrame(
        [("u1", 10, 100.0), ("u1", 15, 150.0), ("u2", 60, 600.0)],
        "k string, ts int, w double")
    return left, right


def test_asof_join_hand_computed(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: r["asof_w"]
           for r in asof_join(left, right, on=["k"], ts_col="ts",
                              value_cols=["w"]).collect()}
    assert out == {
        1: 100.0,   # equal ts is inclusive (backward asof)
        2: 150.0,   # latest of {10, 15} <= 20
        3: None,    # before any right row
        4: None,    # right row exists but only at ts 60 > 50
        5: None,    # key with no right rows at all
    }


def test_asof_join_plan_shape(spark):
    left, right = _frames(spark)
    q = asof_join(left, right, on=["k"], ts_col="ts", value_cols=["w"])
    p = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    # union-and-carry: a window, exactly one hash exchange, and NO join
    # operator at all (a range/theta join would explode on hot keys)
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE)) == 1
    assert "Join" not in p
    assert "Window" in p
