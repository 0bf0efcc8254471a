"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's per-page state machine (none→scan→resolved→verified,
core/state.py:17-22) is batch state; its streaming generalization is a
per-key running aggregate maintained across micro-batches in Spark's state
store.  This module keeps a running (n_events, total_value, last_seen)
per user across micro-batches — the shape any incremental ingest monitor
(docs-per-source watermarks, per-tenant quotas) takes at 100 TB: state is
partitioned by key in the state store, checkpointed with the query, and
survives restarts.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType,
                               TimestampType)

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])
OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("last_ts", TimestampType()),
])


def _update_user(key: Tuple, pdfs: Iterable[pd.DataFrame],
                 state: GroupState):
    n, total = state.get if state.exists else (0, 0.0)
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        m = pdf["ts"].max()
        last_ts = m if last_ts is None else max(last_ts, m)
    state.update((n, round(total, 4)))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [round(total, 4)],
                        "last_ts": [last_ts]})


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming (doc/event source) -> per-user running totals, updated
    every micro-batch, state kept in the store."""
    return (events_stream
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_user,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_stateful_stream(spark: SparkSession, input_dir: str,
                        output_dir: str, checkpoint_dir: str):
    """readStream -> stateful running totals -> per-batch parquet append
    (each batch's rows carry the batch id so the latest snapshot per user is
    max(batch_id))."""
    from .windowed import EVENTS_SCHEMA
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    totals = running_user_totals(stream)

    def sink(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F
        batch.withColumn("batch_id", F.lit(batch_id)) \
             .write.mode("append").parquet(output_dir)

    q = (totals.writeStream
         .foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
