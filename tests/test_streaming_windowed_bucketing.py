"""Watermarked windowed streaming agg == batch agg; bucketed join plans
without an exchange."""

import pyspark.sql.functions as F

from vlm_ocr_doc_reader_spark.sources.bucketing import (bucketed_join,
                                                        write_bucketed)
from vlm_ocr_doc_reader_spark.streaming.windowed import (
    run_windowed_stream, windowed_event_counts)

SF = "/root/testdata/sf0.001"


def test_windowed_stream_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    in_dir = str(tmp_path / "ev_in")
    events.write.parquet(in_dir)

    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    run_windowed_stream(spark, in_dir, out, ckpt)

    got = {(r["window_start"], r["event_type"]): (r["n_events"],
                                                  r["sum_value"])
           for r in spark.read.parquet(out).collect()}
    want = {(r["window_start"], r["event_type"]): (r["n_events"],
                                                   r["sum_value"])
            for r in windowed_event_counts(events).collect()}
    # availableNow + append emits all watermark-finalized windows; with a
    # bounded input everything except (possibly) the trailing windows within
    # the 2h threshold is final
    assert got, "stream emitted nothing"
    missing = {k for k in got if got[k] != want.get(k)}
    assert not missing, f"stream/batch disagree on {sorted(missing)[:3]}"
    unemitted = set(want) - set(got)
    max_ts = max(k[0] for k in want)
    assert all((max_ts - k[0]).total_seconds() <= 3 * 3600
               for k in unemitted), "non-trailing window missing from stream"


def test_session_window_counts(spark):
    """Native session_window: hand-computed sessions; boundary semantics
    match the batch gaps-and-islands operator — a gap EQUAL to the
    threshold merges (touching windows), only gap > threshold splits."""
    from datetime import datetime

    from vlm_ocr_doc_reader_spark.streaming.windowed import \
        session_window_counts

    def t(minute):
        return datetime(2024, 1, 1, minute // 60, minute % 60)

    rows = [(1, t(0), 1, "click", 1.0, "{}"),
            (2, t(10), 1, "click", 2.0, "{}"),   # same session (10m gap)
            (3, t(40), 1, "click", 4.0, "{}"),   # gap == 30m threshold ->
                                                 # touches [10,40) -> MERGES
            (5, t(71), 1, "click", 16.0, "{}"),  # gap 31m > threshold ->
                                                 # NEW session
            (4, t(5), 2, "view", 8.0, "{}")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {(r["user_id"], r["session_start"]): (r["n_events"],
                                                r["sum_value"])
           for r in session_window_counts(ev, gap="30 minutes").collect()}
    assert got == {
        (1, t(0)): (3, 7.0),
        (1, t(71)): (1, 16.0),
        (2, t(5)): (1, 8.0),
    }


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(f"{SF}/lineitem.parquet") \
            .select("l_orderkey", "l_quantity") \
            .withColumnRenamed("l_orderkey", "orderkey")
        o = spark.read.parquet(f"{SF}/orders.parquet") \
            .select("o_orderkey", "o_totalprice") \
            .withColumnRenamed("o_orderkey", "orderkey")
        write_bucketed(li, "b_lineitem", "orderkey", 8)
        write_bucketed(o, "b_orders", "orderkey", 8)
        j = bucketed_join(spark, "b_lineitem", "b_orders", "orderkey")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan          # co-located: no shuffle
        assert j.count() == 6000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
