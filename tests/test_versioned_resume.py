"""T5: content-hash versioned resume — a changed document is new work, an
unchanged one is skipped (reference: content hash pins the workspace
identity, core/state.py:225-241,283-298)."""

from vlm_ocr_doc_reader_spark.plans.extract import extract
from vlm_ocr_doc_reader_spark.sources.readers import DOCUMENTS_SCHEMA
from vlm_ocr_doc_reader_spark.state.manifest import commit_phase, pending_docs


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def test_changed_doc_is_reprocessed(spark, tmp_path):
    state = str(tmp_path / "st")
    v1 = _docs(spark, [
        ("d1", [("text", "Original content sentence here.", None, 0)]),
        ("d2", [("text", "Stable content sentence here.", None, 0)]),
    ])
    out1 = extract(v1)
    commit_phase(out1, spark, state, "extract", input_docs=v1)

    # same content -> nothing pending under version keying
    assert pending_docs(v1, spark, state, "extract",
                        by_version=True).count() == 0
    # doc_id-keyed resume also clean
    assert pending_docs(v1, spark, state, "extract").count() == 0

    # d1 changes -> only d1 pending by version; none pending by id
    v2 = _docs(spark, [
        ("d1", [("text", "Updated content sentence here.", None, 0)]),
        ("d2", [("text", "Stable content sentence here.", None, 0)]),
    ])
    todo = pending_docs(v2, spark, state, "extract", by_version=True)
    assert [r["doc_id"] for r in todo.collect()] == ["d1"]
    assert pending_docs(v2, spark, state, "extract").count() == 0

    # processing + committing the changed doc clears it
    commit_phase(extract(todo), spark, state, "extract", input_docs=todo)
    assert pending_docs(v2, spark, state, "extract",
                        by_version=True).count() == 0

    # compaction keeps only the LATEST (doc_id, phase) row — version-keyed
    # resume semantics survive: current content stays clean, and reverting
    # d1 to its ORIGINAL content makes it pending again (the old hash row
    # was compacted away, which is the conservative/correct direction)
    from vlm_ocr_doc_reader_spark.state.manifest import (compact_manifest,
                                                         read_manifest)
    kept = compact_manifest(spark, state)
    assert kept == 2
    assert read_manifest(spark, state).count() == 2
    assert pending_docs(v2, spark, state, "extract",
                        by_version=True).count() == 0
    reverted = pending_docs(v1, spark, state, "extract", by_version=True)
    assert [r["doc_id"] for r in reverted.collect()] == ["d1"]
