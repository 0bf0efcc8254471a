"""Resolution Levels pipeline tests: scan -> resolve -> verify state machine
parity with the reference (core/reader.py:128-532), plus registry operator
unit tests (upsert J1, pending P2, apply P6/P7, validate P5)."""

import pyspark.sql.functions as F
import pytest

from vlm_ocr_doc_reader_spark.fixtures.generate import (
    generate_documents, write_documents_parquet)
from vlm_ocr_doc_reader_spark.operators.registry import (
    REGISTRY_COLS, apply_ocr_result, pending_entities, upsert_entries,
    validate_entries)
from vlm_ocr_doc_reader_spark.plans.levels import resolve, scan, verify

REG_SCHEMA = ("doc_id string, page_num int, entity_id string, prompt string, "
              "resolution int, value string, context string, "
              "verified boolean, confidence string")


@pytest.fixture(scope="module")
def docs_df(spark, tmp_path_factory):
    docs = generate_documents(40, seed=7, mega_spans=500)
    # add a doc with known digit targets
    docs.append(("doc_digits", [
        ("text", "The contract number is 7704123456 as filed.", None, 0),
        ("text", "Secondary id 123456789 and code 555666777 appear here.", None, 1),
        ("text", "No digits in this sentence at all.", None, 2),
        ("boilerplate", "copyright 999999999", None, 3),
    ]))
    path = str(tmp_path_factory.mktemp("lv") / "docs.parquet")
    write_documents_parquet(docs, path)
    return spark.read.parquet(path)


def test_scan_builds_registry(docs_df):
    reg = scan(docs_df)
    rows = reg.filter(F.col("doc_id") == "doc_digits").collect()
    assert len(rows) == 3  # two runs in span 1, one in span 0; boiler excluded
    assert all(r["resolution"] == 0 and not r["verified"] for r in rows)
    assert all(r["entity_id"].startswith("scan_") for r in rows)
    pages = sorted(r["page_num"] for r in rows)
    assert pages == [1, 2, 2]


def test_resolve_fills_values(docs_df):
    reg = scan(docs_df)
    reg1 = resolve(docs_df, reg)
    got = {(r["page_num"], r["value"])
           for r in reg1.filter(F.col("doc_id") == "doc_digits").collect()}
    assert got == {(1, "7704123456"), (2, "123456789"), (2, "555666777")}
    assert reg1.filter(F.col("resolution") < 1).count() == 0


def test_resolve_is_incremental(docs_df):
    """Second resolve finds nothing pending — the reference's 'does only what
    is not yet done' (decision_001:48)."""
    reg1 = resolve(docs_df, scan(docs_df))
    assert pending_entities(reg1).count() == 0
    reg2 = resolve(docs_df, reg1)
    a = sorted(map(tuple, reg1.collect()))
    b = sorted(map(tuple, reg2.collect()))
    assert a == b


def test_verify_unanimous(docs_df):
    reg2 = verify(docs_df, resolve(docs_df, scan(docs_df)), axes=(1, 3, 5))
    d = reg2.filter(F.col("doc_id") == "doc_digits").collect()
    assert all(r["resolution"] == 2 for r in d)
    assert all(r["confidence"] == "3/3" and r["verified"] for r in d)
    assert {r["value"] for r in d} == {"7704123456", "123456789", "555666777"}


def test_verify_chunked_axes_disagree(docs_df):
    """axis_mode='chunk': axes read 17/34/51-char windows of the span, so
    they genuinely disagree on 'doc_digits' — page 1's digits occupy chars
    24-33 (axis 1's 17-char window misses them, axes 2/3 contain them fully
    -> 2/3), and the vote's k/N semantics run end-to-end instead of only in
    unit tests."""
    reg2 = verify(docs_df, resolve(docs_df, scan(docs_df)), axes=(1, 2, 3),
                  axis_mode="chunk", axis_chunk_chars=17)
    d = {r["page_num"]: r
         for r in reg2.filter((F.col("doc_id") == "doc_digits")
                              & (F.col("value") == "7704123456")).collect()}
    r = d[1]
    assert r["resolution"] == 2
    assert r["confidence"] == "2/3" and not r["verified"]
    # non-unanimous rows exist corpus-wide, unanimous ones too
    confs = {r["confidence"] for r in reg2.collect()}
    assert any(c != "3/3" for c in confs)

    with pytest.raises(ValueError):
        verify(docs_df, scan(docs_df), axis_mode="bogus")


# ---- registry operator units ----

def test_upsert_updates_and_appends(spark):
    reg = spark.createDataFrame(
        [("d1", 1, "e1", "p1", 0, None, None, False, None),
         ("d1", 1, "e2", "p2", 1, "v2", "c2", False, None)], REG_SCHEMA)
    upd = spark.createDataFrame(
        [("d1", 1, "e1", "p1", 1, "v1", "c1", False, None),   # update
         ("d1", 2, "e3", "p3", 0, None, None, False, None),   # append
         ("d1", 2, "", "px", 0, None, None, False, None)],    # skipped
        REG_SCHEMA)
    out = {r["entity_id"]: r for r in upsert_entries(reg, upd).collect()}
    assert set(out) == {"e1", "e2", "e3"}
    assert out["e1"]["value"] == "v1" and out["e1"]["resolution"] == 1
    assert out["e2"]["value"] == "v2"
    assert list(upsert_entries(reg, upd).columns) == list(REGISTRY_COLS)


def test_apply_ocr_result_error_keeps_pending(spark):
    entries = spark.createDataFrame(
        [("d1", 1, "e1", "p", 0, None, None, False, None),
         ("d1", 1, "e2", "p", 0, None, None, False, None),
         ("d1", 1, "e3", "p", 0, None, None, False, None)], REG_SCHEMA)
    results = spark.createDataFrame(
        [("d1", "e1", "val", "ctx", "ok"),
         ("d1", "e2", None, "expl", "no_data")],
        "doc_id string, entity_id string, value string, context string, status string")
    out = {r["entity_id"]: r
           for r in apply_ocr_result(entries, results).collect()}
    assert out["e1"]["resolution"] == 1 and out["e1"]["value"] == "val"
    assert out["e2"]["resolution"] == 1 and out["e2"]["value"] == ""  # no_data -> ''
    assert out["e3"]["resolution"] == 0 and out["e3"]["value"] is None  # missing -> error -> pending


def test_validate_entries_quarantine(spark):
    raw = spark.createDataFrame(
        [("d1", 1, "e1", "p", 0, None, None, False, None),
         ("d1", 0, "e2", "p", 0, None, None, False, None),      # bad page
         ("d1", 2, "e3", None, 0, None, None, False, None),     # no prompt
         ("d1", None, "e4", "p", 0, None, None, False, None)],  # null page
        REG_SCHEMA)
    good, quarantine = validate_entries(raw)
    assert {r["entity_id"] for r in good.collect()} == {"e1"}
    assert {r["entity_id"] for r in quarantine.collect()} == {"e2", "e3", "e4"}


def test_resolve_page_filter(docs_df):
    """P3: --pages restricts resolve to those pages; others stay pending."""
    reg = scan(docs_df)
    reg1 = resolve(docs_df, reg, pages=[1])
    d = {r["page_num"]: r["resolution"]
         for r in reg1.filter(F.col("doc_id") == "doc_digits").collect()}
    assert d[1] == 1          # page 1 resolved
    assert d[2] == 0          # page 2 untouched, still pending
    left = pending_entities(reg1).filter(F.col("doc_id") == "doc_digits")
    assert left.count() == 2
