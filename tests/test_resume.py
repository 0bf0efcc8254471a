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
                                                     pending_docs,
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
