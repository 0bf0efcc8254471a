"""Checkpoint manifest: resumable incremental state at corpus scale (T1/J7).

The reference persists a per-document state machine
(none→scan→resolved→verified, core/state.py:17-22,842-850) and re-derives
pending work from it on every call, so a rerun "does only what is not yet
done" (decision_001_resolution_levels.md:48).  At 10^12 docs that state
machine becomes an append-only manifest table:

  (doc_id string, phase string, content_hash string, n_spans long, ts timestamp)

plus a per-partition metrics side table (lineage + throughput).  A restarted
job anti-joins its input against the manifest (J7 — the backbone of
resumability) and processes only the remainder; outputs are written
partitioned, so completed work is never recomputed or rewritten.

Plain parquet directories stand in for Iceberg tables in this sandbox (same
append/anti-join pattern; MERGE-based dedup would replace the anti-join on a
real Iceberg catalog).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MANIFEST_SCHEMA = ("doc_id string, phase string, content_hash string, "
                   "n_spans long, ts timestamp, run_id string")
METRICS_SCHEMA = ("phase string, partition_id int, docs long, spans long, "
                  "ts timestamp")


def manifest_path(state_dir: str) -> str:
    return os.path.join(state_dir, "manifest")


def recover_manifest(state_dir: str) -> bool:
    """Crash recovery for the compaction swap: if a crash left the manifest
    renamed aside (``manifest.old`` present, ``manifest`` missing), rename
    it back.  Returns True when a recovery happened.  Idempotent; called by
    every manifest read and by ``compact_manifest`` itself, so no consumer
    can observe the swap's intermediate state as data loss."""
    path = manifest_path(state_dir)
    old = path + ".old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
        return True
    return False


def metrics_path(state_dir: str) -> str:
    return os.path.join(state_dir, "metrics")


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    try:
        return spark.read.schema(schema).parquet(path)
    except Exception:
        return spark.createDataFrame([], schema)


def read_manifest(spark: SparkSession, state_dir: str,
                  phase: str | None = None) -> DataFrame:
    recover_manifest(state_dir)
    m = _read_or_empty(spark, manifest_path(state_dir), MANIFEST_SCHEMA)
    if phase is not None:
        m = m.filter(F.col("phase") == phase)
    return m


def input_hash(documents: DataFrame) -> DataFrame:
    """(doc_id, content_hash) of the INPUT spans — the document version
    identity (T5: changed content = new identity, decision_001:149-156)."""
    return documents.select(
        "doc_id",
        F.sha2(F.to_json(F.struct("doc_id", "spans")), 256)
         .alias("content_hash"))


def pending_docs(documents: DataFrame, spark: SparkSession, state_dir: str,
                 phase: str, by_version: bool = False) -> DataFrame:
    """Input docs not yet completed for ``phase`` (left-anti join, J7).

    ``by_version=True`` keys the check on (doc_id, content_hash of the input
    spans): a document whose content changed since its manifest entry is
    treated as new work — the reference's content-hash workspace identity
    (core/state.py:225-241,283-298)."""
    if by_version:
        done = read_manifest(spark, state_dir, phase) \
            .select("doc_id", "content_hash")
        keyed = documents.join(input_hash(documents), "doc_id")
        return keyed.join(done, ["doc_id", "content_hash"], "left_anti") \
                    .drop("content_hash")
    done = read_manifest(spark, state_dir, phase).select("doc_id")
    return documents.join(done, "doc_id", "left_anti")


def new_run_id() -> str:
    """Lineage id for one commit unit (a run / micro-batch).  Outputs tagged
    with it and manifest rows referencing it make the output-write +
    manifest-commit pair atomic in effect: ``read_committed`` drops output
    rows whose run was never committed."""
    return uuid.uuid4().hex


def commit_phase(processed: DataFrame, spark: SparkSession, state_dir: str,
                 phase: str, input_docs: DataFrame | None = None,
                 run_id: str | None = None) -> None:
    """Append (doc_id, phase, hash, n_spans, ts, run_id) for processed docs,
    plus a per-partition metrics row (docs/spans counts + commit timestamp) —
    the reference's incremental save (auto_save=True,
    core/processor.py:179-181) generalized to partition granularity.

    ``input_docs`` (when given) supplies the version hash from the INPUT
    spans so a later ``pending_docs(by_version=True)`` can detect changed
    documents; without it the hash is of the processed row (sufficient for
    doc_id-keyed resume).

    Commit ORDER is the atomicity protocol (write outputs first, commit the
    manifest referencing ``run_id`` last): a crash between the two leaves
    orphan output rows that ``read_committed`` filters out, and the next run
    reprocesses those docs — no duplicates, no loss."""
    if input_docs is not None:
        hashes = input_hash(input_docs)
        entries = (processed.select("doc_id").join(hashes, "doc_id"))
    else:
        entries = processed.select(
            "doc_id",
            F.sha2(F.to_json(F.struct("*")), 256).alias("content_hash"))
    n_spans = (processed.select(
        "doc_id", (F.size(F.col("spans")).cast("long")
                   if "spans" in processed.columns
                   else F.lit(0).cast("long")).alias("n_spans")))
    entries = (entries.join(n_spans, "doc_id")
               .select("doc_id",
                       F.lit(phase).alias("phase"),
                       "content_hash", "n_spans",
                       F.current_timestamp().alias("ts"),
                       F.lit(run_id).cast("string").alias("run_id")))
    entries.write.mode("append").parquet(manifest_path(state_dir))

    metrics = (processed
               .select(F.spark_partition_id().alias("partition_id"),
                       (F.size(F.col("spans")).cast("long")
                        if "spans" in processed.columns
                        else F.lit(0).cast("long")).alias("nsp"))
               .groupBy("partition_id")
               .agg(F.count("*").alias("docs"), F.sum("nsp").alias("spans"))
               .select(F.lit(phase).alias("phase"), "partition_id", "docs",
                       "spans", F.current_timestamp().alias("ts")))
    metrics.write.mode("append").parquet(metrics_path(state_dir))


def read_metrics(spark: SparkSession, state_dir: str) -> DataFrame:
    return _read_or_empty(spark, metrics_path(state_dir), METRICS_SCHEMA)


def check_output_layout(output_dir: str) -> None:
    """Refuse to append flat run_id-column files into a directory written by
    the old ``partitionBy('run_id')`` layout: Spark's partition discovery
    rejects the mixed structure, so an in-place upgrade would corrupt the
    directory.  Clear migration message instead (read the old dir, rewrite
    flat with run_id as a column, or start a fresh output dir).

    Raises ``ValueError`` (catchable by programmatic callers — notebooks,
    the incremental runner); the CLI translates it to an exit code."""
    try:
        entries = os.listdir(output_dir)
    except FileNotFoundError:
        return
    if any(e.startswith("run_id=") for e in entries):
        raise ValueError(
            f"output dir {output_dir!r} uses the legacy run_id= partitioned "
            "layout; appending flat files would break partition discovery. "
            "Migrate once (read the dir, write elsewhere without "
            "partitionBy) or point --output at a fresh directory.")


def read_committed(spark: SparkSession, output_dir: str, state_dir: str,
                   phase: str) -> DataFrame:
    """Output rows whose (doc_id, run_id) is committed in the manifest.

    This is the consumer half of the atomicity protocol: output parquet is
    appended BEFORE the manifest commit, so a crash in between leaves rows
    with a run_id no manifest entry references — they are dropped here (and
    the docs get reprocessed by the next run's anti-join, because the
    manifest never saw them).

    Legacy outputs written before run tagging share the directory (one flat
    layout): mergeSchema surfaces their rows with a null run_id, and they
    fall back to doc_id-only committed filtering — committed legacy docs are
    never dropped for lacking a run tag."""
    out = spark.read.option("mergeSchema", "true").parquet(output_dir)
    m = read_manifest(spark, state_dir, phase)
    if "run_id" not in out.columns:
        return out.join(m.select("doc_id"), "doc_id", "left_semi")
    tagged = (out.filter(F.col("run_id").isNotNull())
              .join(m.select("doc_id", "run_id"), ["doc_id", "run_id"],
                    "left_semi"))
    legacy = (out.filter(F.col("run_id").isNull())
              .join(m.select("doc_id"), "doc_id", "left_semi"))
    return tagged.unionByName(legacy)


def compact_manifest(spark: SparkSession, state_dir: str) -> int:
    """Rewrite the append-only manifest keeping only the LATEST row per
    (doc_id, phase) — bounds the manifest read for long-lived incremental
    pipelines (the reference's analog is its single upsert-keyed state file,
    core/state.py:795-822).  Returns the retained row count.

    One shuffle on (doc_id, phase) over manifest rows only (never the data).
    Plain-parquet stand-in for an Iceberg RewriteFiles/MERGE snapshot: the
    new manifest is materialized to a sibling dir and swapped in; on a real
    catalog the swap is an atomic snapshot commit.

    The swap never has a window where the manifest is gone: the live dir is
    renamed aside to ``manifest.old`` FIRST, the compacted dir renamed into
    place SECOND, and only then is ``.old`` deleted.  A crash between any
    two steps is healed by ``recover_manifest`` (rename ``.old`` back when
    ``manifest`` is missing) on the next read — rmtree-before-rename would
    instead orphan every committed output row."""
    recover_manifest(state_dir)
    path = manifest_path(state_dir)
    old = path + ".old"
    m = _read_or_empty(spark, path, MANIFEST_SCHEMA)
    w = Window.partitionBy("doc_id", "phase") \
        .orderBy(F.desc("ts"), F.desc("run_id"))
    latest = (m.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))
    tmp = path + ".compact"
    latest.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    # leftover .old here can only be post-swap debris (recover_manifest saw
    # `manifest` present) — safe to clear before taking its name
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return n
