"""Incrementally-maintained continuous aggregate (streaming time_rollup).

The batch ``datapipe.sessions.time_rollup`` computes the hour/day
hypertable levels in one job; this module MAINTAINS the same aggregate as
events stream in — the materialized-view refresh loop a TimescaleDB
continuous aggregate runs, expressed as Structured Streaming over
``foreachBatch``:

  each micro-batch -> batch time_rollup over the batch's events (tiny
                      partial: at most levels x buckets x keys rows)
                   -> written to its OWN ``batch_id=<n>`` partition;
  readers          -> fold all partials with one groupBy
                      (``read_rollup``), optionally compacted.

Why partials instead of merge-rewrite: a rewrite-the-table MERGE leaves a
crash window between the table swap and the processed-batch marker in
which a checkpoint replay double-counts.  Writing each batch's partial to
its own partition is IDEMPOTENT — a replayed batch overwrites its own
directory with identical content (the rollup is deterministic) and
nothing else — so exactly-once falls out of the layout with no marker
protocol at all.  Folding partials is EXACT because the batch operator's
value sums are decimal (associative): any micro-batch split of the event
stream folds to byte-identical totals, which double sums could not
guarantee — the same determinism argument as ARCHITECTURE.md §6.

Why foreachBatch and not a chained streaming agg: the day level
re-aggregates the hour level, and stacked stateful aggregations are not
expressible in one append-mode streaming query.

Scale shape: per batch the events reduce map-side to the partial's
bucket-cardinality rows before anything is written; the reader's fold
aggregates partition-count x bucket-cardinality rows, independent of
event volume; ``compact_rollup`` bounds the partition count between
refreshes.  On a lakehouse the partial write is the same protocol with
``MERGE INTO`` replacing the reader-side fold (ARCHITECTURE.md §5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datapipe.sessions import time_rollup

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")

_AGG_COLS = ["level", "bucket", "key"]


def _fold(parts: DataFrame) -> DataFrame:
    return (parts.groupBy(*_AGG_COLS)
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sum_value").alias("sum_value")))


def read_rollup(spark: SparkSession, table_dir: str) -> DataFrame:
    """Consumer view of the maintained aggregate: fold every batch
    partial.  Exact at any batch split (decimal sums)."""
    return _fold(spark.read.parquet(os.path.join(table_dir, "batch_id=*"))
                 .select(*_AGG_COLS, "n_events", "sum_value"))


def compact_rollup(spark: SparkSession, table_dir: str) -> None:
    """Fold all partials into one ``batch_id=compacted`` partition and
    drop the originals — bounds reader-side partition counts between
    refreshes.  Safe relative to the stream: a concurrent in-flight batch
    writes a NEW partition, which survives the compaction swap."""
    import shutil
    existing = sorted(d for d in os.listdir(table_dir)
                      if d.startswith("batch_id="))
    # fold EXACTLY the snapshotted partitions (explicit paths), never a
    # fresh glob: a micro-batch landing between the listdir and the fold
    # would otherwise be folded into the compacted partition AND survive
    # the deletion loop below — double-counted by every later read
    folded = _fold(spark.read.parquet(
        *[os.path.join(table_dir, d) for d in existing])
        .select(*_AGG_COLS, "n_events", "sum_value"))
    staging = os.path.join(table_dir, "_compact_staging")
    folded.write.mode("overwrite").parquet(staging)
    target = os.path.join(table_dir, "batch_id=compacted")
    shutil.rmtree(target, ignore_errors=True)
    os.rename(staging, target)
    for d in existing:
        if d != "batch_id=compacted":
            shutil.rmtree(os.path.join(table_dir, d), ignore_errors=True)


def run_streaming_rollup(spark: SparkSession, input_dir: str,
                         table_dir: str, checkpoint_dir: str,
                         levels: tuple[str, ...] = ("hour", "day"),
                         available_now: bool = True):
    """Maintain the continuous aggregate at ``table_dir`` from event
    files landing in ``input_dir``.  Returns the streaming query (already
    awaited when ``available_now``)."""
    os.makedirs(table_dir, exist_ok=True)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        partial = time_rollup(batch, levels=levels)
        # idempotent under checkpoint replay: the batch's partition is
        # overwritten with identical (deterministic) content
        partial.write.mode("overwrite").parquet(
            os.path.join(table_dir, f"batch_id={batch_id}"))

    writer = stream.writeStream.foreachBatch(process_batch) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
