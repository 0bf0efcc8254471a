"""Event-time streaming: watermark + tumbling-window aggregation.

The reference has no event-time semantics (SURVEY §2.9), but a training-data
ingestion pipeline does: late-arriving documents/events must fold into the
right window without unbounded state.  This module is the canonical
readStream -> watermark -> window agg -> writeStream shape over the events
table schema (event_id, ts, user_id, event_type, value, props).

State bound: the watermark lets Spark drop window state older than
``late_threshold``; at 100 TB/day ingest this is what keeps the streaming
job's state store finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def windowed_event_counts(events: DataFrame,
                          window_len: str = "1 hour",
                          late_threshold: str = "2 hours") -> DataFrame:
    """Tumbling-window counts/sums per event_type with a watermark.

    Works on both a static and a streaming DataFrame (Spark's unified
    semantics) — tests exercise both and compare results.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", late_threshold)
    return (src
            .groupBy(F.window("ts", window_len).alias("w"), "event_type")
            # exact decimal accumulation: partition order (and micro-batch
            # boundaries in the streaming run) cannot move a rounding edge
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
                  .cast("double").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def session_window_counts(events: DataFrame,
                          gap: str = "30 minutes",
                          late_threshold: str = "2 hours") -> DataFrame:
    """Native ``session_window`` aggregation (the streaming twin of the
    batch gaps-and-islands in ``datapipe/sessions.py``): per-user sessions
    close after ``gap`` of silence; with a watermark, closed sessions leave
    the state store.

    Boundary semantics MATCH the batch operator (pinned by test): an event
    at exactly last_event + gap touches the open window [start,
    last + gap) and MERGES into the session — i.e. sessions split only on
    gap > threshold, same as the batch gaps-and-islands split.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", late_threshold)
    return (src
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "user_id", "n_events", "sum_value"))


def run_windowed_stream(spark: SparkSession, input_dir: str,
                        output_dir: str, checkpoint_dir: str,
                        window_len: str = "1 hour",
                        late_threshold: str = "2 hours"):
    """readStream(parquet) -> watermark -> windowed agg -> parquet sink,
    append mode (only watermark-finalized windows are emitted)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    agg = windowed_event_counts(stream, window_len, late_threshold)
    q = (agg.writeStream
         .outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start(output_dir))
    q.awaitTermination()
    return q
