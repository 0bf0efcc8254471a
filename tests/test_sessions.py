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


def test_time_rollup_reaggregates_consistently(spark):
    """Day buckets are sums of the hour level; both levels total the raw."""
    from vlm_ocr_doc_reader_spark.datapipe.sessions import time_rollup
    rows = [(i, datetime(2024, 1, 1 + i // 30, (i * 3) % 24, i % 60),
             "click" if i % 2 else "view", float(i)) for i in range(90)]
    df = spark.createDataFrame(
        rows, "event_id int, ts timestamp, event_type string, value double")
    out = time_rollup(df, levels=("hour", "day")).collect()
    hours = [r for r in out if r["level"] == "hour"]
    days = [r for r in out if r["level"] == "day"]
    assert sum(r["n_events"] for r in hours) == 90
    assert sum(r["n_events"] for r in days) == 90
    # sum_value is exact decimal by construction (order-invariant) — the
    # total over day buckets is exactly the raw total
    assert sum(float(r["sum_value"]) for r in days) \
        == sum(float(i) for i in range(90))
    # every day bucket equals the sum of its hour buckets
    from collections import defaultdict
    agg = defaultdict(int)
    for r in hours:
        agg[(r["bucket"].date(), r["key"])] += r["n_events"]
    for r in days:
        assert agg[(r["bucket"].date(), r["key"])] == r["n_events"]


def test_sessionize_single_exchange(spark):
    df = spark.createDataFrame(
        [_ev(1, 1, 0)], "event_id int, user_id int, ts timestamp")
    q = session_summary(df)
    p = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    # windows + final agg all share hashpartitioning(user_id): one Exchange
    import re
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE)) == 1
