"""Incrementally-maintained continuous aggregate (streaming time_rollup).

The batch ``datapipe.sessions.time_rollup`` computes the hour/day
hypertable levels in one job; this module MAINTAINS the same aggregate as
events stream in — the materialized-view refresh loop a TimescaleDB
continuous aggregate runs, expressed as Structured Streaming over
``foreachBatch``:

  each micro-batch -> batch time_rollup over the batch's events (tiny
                      partial: at most levels x buckets x keys rows)
                   -> written to its OWN ``batch_id=<n>`` partition;
  readers          -> fold the newest compacted generation + every
                      not-yet-folded partial with one groupBy
                      (``read_rollup``).

Why partials instead of merge-rewrite: a rewrite-the-table MERGE leaves a
crash window between the table swap and the processed-batch marker in
which a checkpoint replay double-counts.  Writing each batch's partial to
its own partition is IDEMPOTENT — a replayed batch overwrites its own
directory with identical content (the rollup is deterministic) and
nothing else.  Folding partials is EXACT because the batch operator's
value sums are decimal (associative): any micro-batch split of the event
stream folds to byte-identical totals, which double sums could not
guarantee — the same determinism argument as ARCHITECTURE.md §6.

Compaction protocol (generation-based; replaces the r5 rename-and-delete,
whose two crash/replay double-count windows were the r5 advice finding):

  * each ``compact_rollup`` writes a NEW ``batch_id=compacted_g<n>``
    partition containing the fold of (previous generation + unfolded
    partials), then commits it by writing a ``_folded.json`` manifest —
    the union of every numeric batch id ever folded — INSIDE it (written
    last; underscore files are invisible to Spark's parquet reader);
  * readers select the newest generation THAT HAS a manifest and skip
    (a) older generations and (b) any ``batch_id=N`` partial whose N is
    in the manifest — so a crash that leaves both the new generation and
    the original partials on disk cannot double-count, and neither can a
    checkpoint replay that rewrites a long-since-folded partial;
  * deleting superseded generations and folded partials is pure garbage
    collection (done opportunistically at the next compaction); reader
    correctness never depends on a deletion having happened.

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

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datapipe.sessions import time_rollup

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")

_AGG_COLS = ["level", "bucket", "key"]

_GEN_RE = re.compile(r"^batch_id=compacted_g(\d+)$")
_PARTIAL_RE = re.compile(r"^batch_id=(\d+)$")
_MANIFEST = "_folded.json"


def _fold(parts: DataFrame) -> DataFrame:
    return (parts.groupBy(*_AGG_COLS)
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sum_value").alias("sum_value")))


def _snapshot(table_dir: str):
    """One directory listing -> (newest committed generation dir or None,
    its folded-id set, numeric-partial dirs to read, GC candidates).

    A generation without its manifest is an uncommitted compaction crash
    remnant: ignored by readers, garbage-collected by the next compact.
    """
    gens, partials = [], {}
    for d in os.listdir(table_dir):
        m = _GEN_RE.match(d)
        if m:
            gens.append((int(m.group(1)), d))
            continue
        m = _PARTIAL_RE.match(d)
        if m:
            partials[int(m.group(1))] = d
    committed = []
    uncommitted = []
    for n, d in gens:
        if os.path.exists(os.path.join(table_dir, d, _MANIFEST)):
            committed.append((n, d))
        else:
            uncommitted.append(d)
    committed.sort()
    if committed:
        cur_n, cur = committed[-1]
        with open(os.path.join(table_dir, cur, _MANIFEST)) as f:
            folded = set(json.load(f)["folded_batch_ids"])
        stale = [d for _, d in committed[:-1]] + uncommitted
        next_gen = cur_n + 1
    else:
        cur, folded = None, set()
        stale = uncommitted
        next_gen = 0
    live = [d for n, d in sorted(partials.items()) if n not in folded]
    gc = stale + [d for n, d in partials.items() if n in folded]
    return cur, folded, live, gc, next_gen


def read_rollup(spark: SparkSession, table_dir: str) -> DataFrame:
    """Consumer view of the maintained aggregate: newest committed
    compacted generation + every partial not folded into it.  Exact at
    any batch split (decimal sums) and under any crash/replay interleaving
    of the compaction protocol (module docstring).

    A concurrent ``compact_rollup`` deletes superseded directories right
    after committing, so a reader racing it can snapshot a directory that
    is gone by the time the parquet footers are read — a transient
    missing-path error, never a wrong result (the new generation holds
    the same data).  One fresh snapshot+read retry absorbs it.  A new or
    empty table (no committed generation, no live partials) reads as an
    empty 0-row frame with the table schema instead of throwing."""
    last_err: Exception | None = None
    for _attempt in range(2):
        if os.path.isdir(table_dir):
            cur, _folded_ids, live, _gc, _next = _snapshot(table_dir)
        else:
            cur, live = None, []
        paths = ([os.path.join(table_dir, cur)] if cur else []) \
            + [os.path.join(table_dir, d) for d in live]
        if not paths:
            empty = spark.createDataFrame(
                [], "level string, bucket timestamp, key string, "
                    "n_events bigint, sum_value decimal(28,6)")
            return _fold(empty)
        try:
            # parquet footer reads happen here (schema resolution), so a
            # GC'd snapshot path fails at this call, inside the retry
            return _fold(spark.read.parquet(*paths)
                         .select(*_AGG_COLS, "n_events", "sum_value"))
        except Exception as e:  # racing compaction GC'd a snapshotted dir
            # only the path-missing race is retryable (ADVICE r7):
            # genuine corruption / schema errors must surface on the
            # FIRST occurrence, not after a silent re-read
            msg = str(e)
            if ("PATH_NOT_FOUND" not in msg
                    and "Path does not exist" not in msg
                    and "FileNotFound" not in msg):
                raise
            last_err = e
    raise last_err


def compact_rollup(spark: SparkSession, table_dir: str) -> None:
    """Fold the current reader view into one new committed generation and
    garbage-collect superseded directories — bounds reader-side partition
    counts between refreshes.  Safe relative to the stream: a concurrent
    in-flight batch writes a NEW partial, which is not in the snapshot,
    not in the new manifest, and therefore still read."""
    import shutil
    cur, folded, live, gc, next_gen = _snapshot(table_dir)
    src = ([os.path.join(table_dir, cur)] if cur else []) \
        + [os.path.join(table_dir, d) for d in live]
    new_folded = sorted(folded | {int(_PARTIAL_RE.match(d).group(1))
                                  for d in live})
    target = os.path.join(table_dir, f"batch_id=compacted_g{next_gen}")
    shutil.rmtree(target, ignore_errors=True)  # our own crash remnant only
    (_fold(spark.read.parquet(*src)
           .select(*_AGG_COLS, "n_events", "sum_value"))
     .write.mode("overwrite").parquet(target))
    # commit marker LAST: manifest write + atomic rename publishes the
    # generation; before this instant readers still use the old view
    tmp = os.path.join(target, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"folded_batch_ids": new_folded}, f)
    os.rename(tmp, os.path.join(target, _MANIFEST))
    # everything below is GC; correctness holds if we crash anywhere here.
    # (an uncommitted crash remnant can share the new target's name — it
    # is in `gc` but was just overwritten and committed, so skip it)
    for d in gc + ([cur] if cur else []) + live:
        p = os.path.join(table_dir, d)
        if p != target:
            shutil.rmtree(p, ignore_errors=True)


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
        # overwritten with identical (deterministic) content — and if the
        # batch was already folded into a compacted generation, readers
        # skip the rewritten partial via the generation's manifest
        partial.write.mode("overwrite").parquet(
            os.path.join(table_dir, f"batch_id={batch_id}"))

    writer = stream.writeStream.foreachBatch(process_batch) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
