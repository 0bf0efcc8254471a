"""Batch sessionization (datapipe/sessions.py): hand-computed sessions,
boundary gaps, and the one-exchange plan shape."""

from datetime import datetime

from vlm_ocr_doc_reader_spark.datapipe.sessions import (session_summary,
                                                        with_session_id)


def _ev(eid, uid, minute, second=0):
    return (eid, uid, datetime(2024, 1, 1, minute // 60, minute % 60,
                               second))


def test_sessionize_hand_computed(spark):
    rows = [
        _ev(1, 1, 0), _ev(2, 1, 10),           # session 1 (gap 10m)
        _ev(3, 1, 41),                          # gap 31m -> session 2
        _ev(4, 1, 71, 1),                       # gap 30m1s -> session 3
        _ev(5, 1, 101, 1),                      # gap exactly 30m -> same
        _ev(6, 2, 0),                           # user 2: own session 1
    ]
    df = spark.createDataFrame(rows, "event_id int, user_id int, ts timestamp")
    sid = {r["event_id"]: r["session_id"]
           for r in with_session_id(df, gap_minutes=30).collect()}
    assert sid == {1: 1, 2: 1, 3: 2, 4: 3, 5: 3, 6: 1}

    summ = {(r["user_id"], r["session_id"]): r["n_events"]
            for r in session_summary(df, gap_minutes=30).collect()}
    assert summ == {(1, 1): 2, (1, 2): 1, (1, 3): 2, (2, 1): 1}


def test_sessionize_single_exchange(spark):
    df = spark.createDataFrame(
        [_ev(1, 1, 0)], "event_id int, user_id int, ts timestamp")
    q = session_summary(df)
    p = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    # windows + final agg all share hashpartitioning(user_id): one Exchange
    import re
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE)) == 1
