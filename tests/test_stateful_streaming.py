"""applyInPandasWithState: per-key state accumulates across micro-batches
and survives a query restart via the checkpoint."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from vlm_ocr_doc_reader_spark.streaming.stateful import run_stateful_stream

SF = "/root/testdata/sf0.001"


def test_state_accumulates_across_batches_and_restarts(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    half_a.write.mode("append").parquet(in_dir)

    # run 1: only half the events
    run_stateful_stream(spark, in_dir, out, ckpt)
    snap1 = {r["user_id"]: r["n_events"] for r in
             spark.read.parquet(out).collect()}
    want_a = {r["user_id"]: r["n"] for r in
              half_a.groupBy("user_id").agg(F.count("*").alias("n"))
              .collect()}
    assert snap1 == want_a

    # run 2 (restart, same checkpoint): second half lands; state carries over
    half_b.write.mode("append").parquet(in_dir)
    run_stateful_stream(spark, in_dir, out, ckpt)

    latest = (spark.read.parquet(out)
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("user_id")
                        .orderBy(F.desc("batch_id"))))
              .filter("rn = 1"))
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in latest.collect()}
    want = {r["user_id"]: (r["n"], round(r["tv"], 4)) for r in
            ev.groupBy("user_id").agg(
                F.count("*").alias("n"),
                F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 4)
                 .alias("tv")).collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], (u, got[u], want[u])
        assert abs(got[u][1] - want[u][1]) < 1e-3, (u, got[u], want[u])
