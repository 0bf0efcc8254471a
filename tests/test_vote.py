"""All 11 reference voting cases ported to the DataFrame operator
(/root/reference/02_src/tests/test_core/test_voting.py:30-141), plus the F7
normalization cases, asserted on both the pure-Python spec function and the
Column mirror."""

import pytest

from vlm_ocr_doc_reader_spark.extraction.spec import normalize_for_vote
from vlm_ocr_doc_reader_spark.operators.vote import (majority_vote,
                                                     normalize_for_vote_col)

SCHEMA = "entity_id string, axis_idx int, value string, context string, status string"


def vote_one(spark, samples):
    rows = [("e1", i, v, c, s) for i, (v, c, s) in enumerate(samples)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = majority_vote(df).collect()
    assert len(out) == 1
    r = out[0]
    return r["value"], r["context"], r["confidence"], r["verified"]


# ---- normalization (test_voting.py:10-27) ----

@pytest.mark.parametrize("raw,expected", [
    (None, "__NO_DATA__"),
    ("", "__NO_DATA__"),
    ("   ", "__NO_DATA__"),
    ("  ABC  ", "abc"),
    ("1\n2\t3   4", "1 2 3 4"),
    ("7704-123-456", "7704-123-456"),
])
def test_normalize_spec(raw, expected):
    assert normalize_for_vote(raw) == expected


def test_normalize_column_parity(spark):
    import pyspark.sql.functions as F
    raws = [None, "", "   ", "  ABC  ", "1\n2\t3   4", "7704-123-456",
            "OOO Rosatom", "  Hello\tWorld  ", "\t", "\tX\n",
            "\xa0nbsp kept\xa0"]  # \xa0: ASCII semantics on both sides
    df = spark.createDataFrame([(r,) for r in raws], "v string")
    got = [r["n"] for r in
           df.select(normalize_for_vote_col(F.col("v")).alias("n")).collect()]
    assert got == [normalize_for_vote(r) for r in raws]


# ---- majority vote (test_voting.py:30-141) ----

def test_unanimous(spark):
    v, c, conf, ver = vote_one(spark, [("7704123456", "ИНН:", "ok")] * 3)
    assert (v, c, conf, ver) == ("7704123456", "ИНН:", "3/3", True)


def test_majority_2_of_3(spark):
    v, _, conf, ver = vote_one(spark, [
        ("7704123456", "a", "ok"), ("7704123456", "b", "ok"),
        ("7704123457", "c", "ok")])
    assert (v, conf, ver) == ("7704123456", "2/3", False)


def test_all_different_picks_first(spark):
    v, c, conf, ver = vote_one(spark, [
        ("a", "c1", "ok"), ("b", "c2", "ok"), ("c", "c3", "ok")])
    assert (v, c, conf, ver) == ("a", "c1", "1/3", False)


def test_no_data_wins(spark):
    v, c, conf, ver = vote_one(spark, [
        ("", None, "no_data"), (None, None, "no_data"),
        ("spurious", "ctx", "ok")])
    assert (v, c, conf, ver) == ("", None, "2/3", False)


def test_normalization_groups_case_differences(spark):
    v, c, conf, _ = vote_one(spark, [
        ("OOO Rosatom", "c1", "ok"), ("ooo rosatom", "c2", "ok"),
        ("Other", "c3", "ok")])
    assert (v, c, conf) == ("OOO Rosatom", "c1", "2/3")


def test_errors_excluded_from_denominator(spark):
    v, _, conf, ver = vote_one(spark, [
        ("x", "ctx", "ok"), ("x", "ctx2", "ok"), (None, None, "error")])
    assert (v, conf, ver) == ("x", "2/2", False)


def test_all_errors(spark):
    v, c, conf, ver = vote_one(spark, [(None, None, "error")] * 2)
    assert (v, c, conf, ver) == ("", None, "0/2", False)


def test_tie_prefers_earlier_axis(spark):
    v, c, conf, ver = vote_one(spark, [
        ("axis1", "c1", "ok"), ("axis2", "c2", "ok")])
    assert (v, c, conf, ver) == ("axis1", "c1", "1/2", False)


def test_original_value_preserved_not_normalized(spark):
    v, _, conf, _ = vote_one(spark, [
        ("  Hello\tWorld  ", "ctx", "ok"), ("hello world", "ctx2", "ok")])
    assert (v, conf) == ("Hello\tWorld", "2/2")


def test_many_entities_at_once(spark):
    """Set-at-a-time: the operator votes every entity in one pass."""
    rows = []
    for e in range(50):
        for i in range(3):
            val = "agree" if (e % 2 == 0 or i < 2) else f"dis{i}"
            rows.append((f"e{e}", i, val, f"c{i}", "ok"))
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["entity_id"]: r for r in majority_vote(df).collect()}
    assert len(out) == 50
    assert out["e0"]["verified"] and out["e0"]["confidence"] == "3/3"
    assert not out["e1"]["verified"] and out["e1"]["confidence"] == "2/3"
