"""F8 digit normalization (utils/normalization.py test port), F1 fence
strip, and spec<->column parity, incl. property-based checks (hypothesis)."""

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vlm_ocr_doc_reader_spark.extraction.spec import (normalize_for_vote,
                                                      normalize_ocr_digits)
from vlm_ocr_doc_reader_spark.functions.normalize import (
    normalize_ocr_digits_col, strip_json_fence_col)


# ---- pure spec function (fast, reference test port:
#      test_utils/test_normalization.py:8-60) ----

@pytest.mark.parametrize("raw,expected", [
    ("O0l1", "0011"),
    ("I2S3B4", "125384"),
    ("77 04-123.456", "7704123456"),
    ("ИНН: 7704123456", "7704123456"),
    ("xyz digits", None),  # no digits left -> None (normalization.py:72)
])
def test_digit_norm_spec(raw, expected):
    assert normalize_ocr_digits(raw) == expected


def test_digit_norm_none_contract():
    """Reference None contract (utils/normalization.py:31-36)."""
    assert normalize_ocr_digits(None) is None
    assert normalize_ocr_digits("") is None
    # no digits and no transliterable chars (o->0 etc.) -> None
    assert normalize_ocr_digits("xyz && abc") is None


def test_digit_norm_length_gate():
    assert normalize_ocr_digits("77041", expected_len=5) == "77041"
    assert normalize_ocr_digits("77041", expected_len=10) is None


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_digit_norm_only_digits(s):
    out = normalize_ocr_digits(s)
    assert out is None or (out != "" and out.isdigit())


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_vote_norm_idempotent(s):
    once = normalize_for_vote(s)
    if once == "__NO_DATA__":
        # the sentinel itself is not a fixed point (reference behavior:
        # voting.py:30-41 lowercases any non-blank input)
        return
    assert normalize_for_vote(once) == once


# ---- column twins ----

def test_digit_norm_column_parity(spark):
    raws = ["O0l1", "I2S3B4", "77 04-123.456", "ИНН: 7704123456",
            "no digits", "xyz", "", "OolISB"]
    df = spark.createDataFrame([(r,) for r in raws], "v string")
    got = [r["d"] for r in
           df.select(normalize_ocr_digits_col(F.col("v")).alias("d"))
             .collect()]
    assert got == [normalize_ocr_digits(r) for r in raws]

    gated = [r["d"] for r in
             df.select(normalize_ocr_digits_col(F.col("v"), 10).alias("d"))
               .collect()]
    assert gated == [normalize_ocr_digits(r, 10) for r in raws]


def test_strip_json_fence(spark):
    cases = [
        ('```json\n{"a": 1}\n```', '{"a": 1}'),
        ('```\n{"a": 1}\n```', '{"a": 1}'),
        ('{"a": 1}', '{"a": 1}'),
        ('  plain text  ', 'plain text'),
    ]
    df = spark.createDataFrame(cases, "raw string, want string")
    bad = df.filter(strip_json_fence_col(F.col("raw")) != F.col("want"))
    assert bad.count() == 0


def test_normalize_unicode_folds_decomposed(spark):
    from vlm_ocr_doc_reader_spark.functions.normalize import \
        normalize_unicode
    pre = "café"                 # precomposed é
    dec = "café"                # e + combining acute
    df = spark.createDataFrame([(1, pre), (2, dec), (3, None)],
                               "id long, text string")
    out = {r["id"]: r["text"]
           for r in normalize_unicode(df, ["text"], "NFC").collect()}
    assert out[1] == out[2] == pre    # one canonical form
    assert out[3] is None
    # NFKC additionally folds compatibility forms (ligature fi)
    df2 = spark.createDataFrame([(1, "ﬁle")], "id long, text string")
    assert normalize_unicode(df2, ["text"], "NFKC") \
        .collect()[0]["text"] == "file"
    import pytest
    with pytest.raises(ValueError, match="unknown form"):
        normalize_unicode(df, ["text"], "NFX")
