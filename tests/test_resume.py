"""Kill/resume simulation (SURVEY §5 item 4): run the extraction on half the
corpus, commit the manifest, then re-run on the full corpus — only the
remainder is processed and the combined output equals a clean full run.
Reference analog: workspace reattach + pending-work derivation
(core/state.py:901-903, 824-840)."""

import os

import pytest

from vlm_ocr_doc_reader_spark.fixtures.generate import (
    generate_documents, write_documents_parquet)
from vlm_ocr_doc_reader_spark.plans.extract import extract
from vlm_ocr_doc_reader_spark.state.manifest import (commit_phase,
                                                     compact_manifest,
                                                     new_run_id,
                                                     pending_docs,
                                                     read_committed,
                                                     read_manifest,
                                                     read_metrics)


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    docs = generate_documents(60, seed=11, mega_spans=300)
    p = str(tmp_path_factory.mktemp("rs") / "docs.parquet")
    write_documents_parquet(docs, p)
    return p


def test_resume_processes_only_remainder(spark, corpus_path, tmp_path):
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    docs = spark.read.parquet(corpus_path)
    n_total = docs.count()

    # ---- run 1: simulate a job killed after half the docs committed ----
    half = docs.filter(pyhash_half := (docs.doc_id.substr(-1, 1)
                                       .isin(*"02468")))
    out1 = extract(half)
    out1.write.mode("append").parquet(out_dir)
    commit_phase(out1, spark, state_dir, "extract")
    n_half = half.count()
    assert 0 < n_half < n_total
    assert read_manifest(spark, state_dir, "extract").count() == n_half

    # ---- run 2: resume over the FULL input ----
    todo = pending_docs(docs, spark, state_dir, "extract")
    assert todo.count() == n_total - n_half          # zero reprocessing
    out2 = extract(todo)
    out2.write.mode("append").parquet(out_dir)
    commit_phase(out2, spark, state_dir, "extract")

    # ---- combined result == clean full run ----
    resumed = {r["doc_id"]: r["spans"]
               for r in spark.read.parquet(out_dir).collect()}
    clean = {r["doc_id"]: r["spans"] for r in extract(docs).collect()}
    assert resumed == clean

    # run 3: nothing pending
    assert pending_docs(docs, spark, state_dir, "extract").count() == 0

    # metrics lineage recorded per partition per phase
    m = read_metrics(spark, state_dir)
    assert m.count() >= 2
    assert m.groupBy().sum("docs").collect()[0][0] == n_total
    _ = pyhash_half


def test_atomic_commit_crash_between_write_and_manifest(spark, corpus_path,
                                                        tmp_path):
    """Output parquet lands BEFORE the manifest commit; a crash in between
    must not yield duplicate doc rows after the rerun — read_committed drops
    the orphaned run and the rerun reprocesses those docs."""
    import pyspark.sql.functions as F
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    docs = spark.read.parquet(corpus_path)
    n_total = docs.count()

    # run 1 CRASHES after the output write, before commit_phase
    run1 = new_run_id()
    extract(docs).withColumn("run_id", F.lit(run1)) \
        .write.mode("append").parquet(out_dir)
    # (no commit_phase -> manifest never saw run1)

    # rerun: manifest empty, so ALL docs are pending again
    todo = pending_docs(docs, spark, state_dir, "extract")
    assert todo.count() == n_total
    run2 = new_run_id()
    out2 = extract(todo).withColumn("run_id", F.lit(run2))
    out2.write.mode("append").parquet(out_dir)
    commit_phase(out2.drop("run_id"), spark, state_dir, "extract",
                 run_id=run2)

    # raw output has duplicates (both runs); committed view does not
    raw = spark.read.parquet(out_dir)
    assert raw.count() == 2 * n_total
    committed = read_committed(spark, out_dir, state_dir, "extract")
    assert committed.count() == n_total
    assert committed.select("doc_id").distinct().count() == n_total
    clean = {r["doc_id"]: r["spans"] for r in extract(docs).collect()}
    got = {r["doc_id"]: r["spans"]
           for r in committed.drop("run_id").collect()}
    assert got == clean


def test_real_kill_then_resume(corpus_path, tmp_path):
    """Chaos test: SIGKILL an actual extract CLI subprocess mid-run, then
    resume — committed view must equal a clean run with no duplicates.
    If the kill happens to land after completion, the rerun is a no-op and
    the same assertions hold (non-flaky by construction)."""
    import signal
    import subprocess
    import sys
    import time

    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    cmd = [sys.executable, "-m", "vlm_ocr_doc_reader_spark.cli", "extract",
           "--master", "local[2]",
           "--input", corpus_path, "--output", out_dir,
           "--state", state_dir]
    proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL, cwd="/root/repo")
    time.sleep(12)  # JVM boot ~8s; lands somewhere inside the job
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()

    # resume in-process (same CLI code path)
    from vlm_ocr_doc_reader_spark.cli import main
    assert main(["extract", "--input", corpus_path, "--output", out_dir,
                 "--state", state_dir]) == 0

    from vlm_ocr_doc_reader_spark.sources.session import get_spark
    spark = get_spark()
    docs = spark.read.parquet(corpus_path)
    committed = read_committed(spark, out_dir, state_dir, "extract")
    assert committed.count() == docs.count()
    assert committed.select("doc_id").distinct().count() == docs.count()
    clean = {r["doc_id"]: r["spans"] for r in extract(docs).collect()}
    got = {r["doc_id"]: r["spans"]
           for r in committed.select("doc_id", "spans").collect()}
    assert got == clean


def test_manifest_compaction_bounds_reads(spark, corpus_path, tmp_path):
    """K successive commits grow the manifest K-fold; compaction keeps only
    the latest (doc_id, phase) row and resume still sees zero pending."""
    state_dir = str(tmp_path / "state")
    docs = spark.read.parquet(corpus_path)
    n_total = docs.count()
    out = extract(docs)
    for _ in range(3):
        commit_phase(out, spark, state_dir, "extract", run_id=new_run_id())
    assert read_manifest(spark, state_dir).count() == 3 * n_total

    kept = compact_manifest(spark, state_dir)
    assert kept == n_total
    assert read_manifest(spark, state_dir).count() == n_total
    # latest run wins and resume semantics are unchanged
    assert pending_docs(docs, spark, state_dir, "extract").count() == 0


def test_legacy_flat_output_upgraded_in_place(spark, corpus_path, tmp_path):
    """An output dir first written WITHOUT run tagging (legacy flat files)
    must keep working after tagged runs append to it: one flat layout, no
    partition-discovery conflict, and read_committed returns both the
    legacy docs (doc_id-only check) and the tagged docs."""
    import pyspark.sql.functions as F
    from vlm_ocr_doc_reader_spark.state.manifest import check_output_layout
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    docs = spark.read.parquet(corpus_path)
    half = docs.filter(docs.doc_id.substr(-1, 1).isin(*"02468"))
    rest = docs.subtract(half)

    # legacy era: no run_id anywhere
    extract(half).write.mode("append").parquet(out_dir)
    commit_phase(extract(half), spark, state_dir, "extract")

    # upgraded era: tagged flat append into the SAME directory
    check_output_layout(out_dir)  # flat legacy files are fine
    run2 = new_run_id()
    out2 = extract(rest).withColumn("run_id", F.lit(run2))
    out2.write.mode("append").parquet(out_dir)
    commit_phase(out2.drop("run_id"), spark, state_dir, "extract",
                 run_id=run2)

    committed = read_committed(spark, out_dir, state_dir, "extract")
    assert committed.select("doc_id").distinct().count() == docs.count()
    assert committed.count() == docs.count()

    # the OLD partitioned layout is refused with a migration message
    part_dir = str(tmp_path / "old_layout")
    out2.write.mode("append").partitionBy("run_id").parquet(part_dir)
    with pytest.raises(ValueError):
        check_output_layout(part_dir)


def test_compaction_crash_window_recovers(spark, corpus_path, tmp_path):
    """A crash between the compaction swap's two renames must NOT orphan the
    manifest: the next read recovers the '.old' copy and resume still sees
    zero pending (the old rmtree-then-rename swap lost everything here)."""
    from vlm_ocr_doc_reader_spark.state.manifest import (manifest_path,
                                                         recover_manifest)
    state_dir = str(tmp_path / "state")
    docs = spark.read.parquet(corpus_path)
    commit_phase(extract(docs), spark, state_dir, "extract",
                 run_id=new_run_id())
    n = read_manifest(spark, state_dir).count()
    assert n > 0

    # simulate the crash: manifest renamed aside, replacement never landed
    path = manifest_path(state_dir)
    os.rename(path, path + ".old")
    assert not os.path.exists(path)

    # any manifest read heals it; no committed work is forgotten
    assert read_manifest(spark, state_dir).count() == n
    assert pending_docs(docs, spark, state_dir, "extract").count() == 0
    assert not os.path.exists(path + ".old")
    assert not recover_manifest(state_dir)  # idempotent no-op now

    # and compaction itself recovers + completes after such a crash
    os.rename(path, path + ".old")
    kept = compact_manifest(spark, state_dir)
    assert kept == docs.count()
    assert pending_docs(docs, spark, state_dir, "extract").count() == 0
