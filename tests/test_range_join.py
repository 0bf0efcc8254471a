"""Chunked range join (datapipe/ranges.py): hand-computed containment,
boundary inclusivity, multi-chunk intervals, and the no-theta-join plan."""

import re
from datetime import datetime

from vlm_ocr_doc_reader_spark.datapipe.ranges import range_join


def _t(minute, second=0):
    return datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_range_join_hand_computed(spark):
    points = spark.createDataFrame(
        [(1, "u1", _t(0)), (2, "u1", _t(30)), (3, "u1", _t(90)),
         (4, "u1", _t(200)), (5, "u2", _t(30))],
        "pid int, k string, ts timestamp")
    # interval spanning multiple 1-hour chunks (0..90min) + a disjoint one
    intervals = spark.createDataFrame(
        [("u1", _t(0), _t(90), "iv1"), ("u1", _t(150), _t(160), "iv2"),
         ("u2", _t(40), _t(50), "iv3")],
        "k string, st timestamp, en timestamp, iv string")
    got = {(r["pid"], r["iv"])
           for r in range_join(points, intervals, on=["k"], ts_col="ts",
                               start_col="st", end_col="en",
                               chunk_seconds=3600).collect()}
    # boundaries inclusive (pid 1 at st, pid 3 at en); pid 4/5 match nothing
    assert got == {(1, "iv1"), (2, "iv1"), (3, "iv1")}


def test_range_join_left_keeps_unmatched_points(spark):
    """how='left' keeps points with no containing interval as null rows —
    including the trap case where the point's chunk HAS intervals but none
    satisfy the BETWEEN (a post-join residual filter would drop it)."""
    import pytest
    points = spark.createDataFrame(
        [(1, "u1", _t(0)), (2, "u1", _t(95)), (3, "u2", _t(30)),
         (4, "u3", _t(10))],
        "pid int, k string, ts timestamp")
    intervals = spark.createDataFrame(
        # pid 2 (t=95) shares hour-chunk 1 with iv1 (ends t=90) -> unmatched
        [("u1", _t(0), _t(90), "iv1"), ("u2", _t(40), _t(50), "iv3")],
        "k string, st timestamp, en timestamp, iv string")
    got = {(r["pid"], r["iv"])
           for r in range_join(points, intervals, on=["k"], ts_col="ts",
                               start_col="st", end_col="en",
                               chunk_seconds=3600, how="left").collect()}
    assert got == {(1, "iv1"), (2, None), (3, None), (4, None)}

    with pytest.raises(ValueError):
        range_join(points, intervals, on=["k"], ts_col="ts",
                   start_col="st", end_col="en", how="full")


def test_range_join_plan_is_equi_join(spark):
    points = spark.createDataFrame(
        [(1, "u1", _t(0))], "pid int, k string, ts timestamp")
    intervals = spark.createDataFrame(
        [("u1", _t(0), _t(90), "iv1")],
        "k string, st timestamp, en timestamp, iv string")
    q = range_join(points, intervals, on=["k"], ts_col="ts",
                   start_col="st", end_col="en")
    p = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    # hash-partitioned equi-join on (key, chunk); never a nested-loop/
    # cartesian theta join
    assert re.search(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)",
                     p)
    assert "NestedLoop" not in p and "Cartesian" not in p
