"""Stream-stream interval join (streaming/joins.py): bounded-state
correlation of two file-source streams with checkpointed restart."""

import os

import pyspark.sql.functions as F
import pytest

from vlm_ocr_doc_reader_spark.streaming.joins import stream_stream_join

SCHEMA = "event_id long, ts timestamp, user_id long"


def _write(spark, path, rows):
    spark.createDataFrame(
        [(i, f"2024-01-01 10:{m:02d}:00", u) for i, m, u in rows],
        "event_id long, ts string, user_id long") \
        .withColumn("ts", F.col("ts").cast("timestamp")) \
        .coalesce(1).write.mode("append").parquet(path)


def _run(spark, limp, rclk, out, ckpt, how="inner"):
    imps = spark.readStream.schema(SCHEMA).parquet(limp)
    clks = spark.readStream.schema(SCHEMA).parquet(rclk)
    j = stream_stream_join(imps, clks, ("user_id",), within="5 minutes",
                           watermark="10 minutes", how=how)
    q = (j.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()


def test_interval_join_matches_within_bound_and_restarts(spark, tmp_path):
    limp, rclk, out, ckpt = (str(tmp_path / p)
                             for p in ("imp", "clk", "out", "ckpt"))
    # impressions at :00 for users 1,2,3; clicks: u1 at :03 (in window),
    # u2 at :09 (OUTSIDE 5-min window), u9 (no impression)
    _write(spark, limp, [(1, 0, 1), (2, 0, 2), (3, 0, 3)])
    _write(spark, rclk, [(101, 3, 1), (102, 9, 2), (109, 1, 9)])
    _run(spark, limp, rclk, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert {(r["event_id"], r["r_event_id"]) for r in rows} == {(1, 101)}

    # a later click for u3 arrives within ITS impression window ->
    # restart from checkpoint emits exactly the new pair
    _write(spark, rclk, [(103, 4, 3)])
    _run(spark, limp, rclk, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert {(r["event_id"], r["r_event_id"]) for r in rows} == \
        {(1, 101), (3, 103)}


def test_interval_join_refuses_unknown_how(spark, tmp_path):
    p = str(tmp_path / "x")
    _write(spark, p, [(1, 0, 1)])
    s = spark.readStream.schema(SCHEMA).parquet(p)
    with pytest.raises(ValueError, match="how"):
        stream_stream_join(s, s, ("user_id",), how="full")
    with pytest.raises(ValueError, match="interval"):
        stream_stream_join(s, s, ("user_id",), within="5min")  # fail fast,
    # not a Catalyst ParseException at stream start

    # compound and any-unit intervals are VALID Spark intervals and must
    # pass validation (r4 advice: the old regex rejected them)
    for ok in ("1 hour 30 minutes", "90 seconds", "2 days 1 hour"):
        stream_stream_join(s, s, ("user_id",), within=ok)
