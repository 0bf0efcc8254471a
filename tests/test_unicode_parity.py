"""Adversarial parity fuzz: random strings over a hostile alphabet (unicode
whitespace, unicode digits, partial markers) must classify and clean
identically in the pure-Python spec and the Catalyst mirror — this is what
makes the oracle a valid golden reference beyond the generator's dialect."""

import random

import pyspark.sql.functions as F

from vlm_ocr_doc_reader_spark.extraction import spec
from vlm_ocr_doc_reader_spark.operators.classify import classify

ALPHABET = list(
    "ab z.|!?-0159"
    "\t\n "
    "\xa0  "      # unicode whitespace (must NOT collapse)
    "٣১"          # arabic-indic / bengali digits (must NOT be \d)
    "абв"
) + ["[[img_1]]", "[[tbl_", "]]", "@@bbox:", "@@bbox:1,2,3,4@@",
     "copyright", "all rights reserved", "|||", ". "]


def test_unicode_fuzz_parity(spark):
    rng = random.Random(1234)
    rows = []
    kinds = ["text", "heading", "image", "table", "boilerplate", "link"]
    for i in range(2500):
        s = "".join(rng.choice(ALPHABET)
                    for _ in range(rng.randint(0, 14)))
        rows.append((f"d{i % 10}", rng.choice(kinds), s,
                     rng.choice([None, "", "img_1"]), i))
    df = spark.createDataFrame(
        rows,
        "doc_id string, kind string, text string, media_ref string, offset long")
    got = classify(df).select("kind", "text", "media_ref", "cleaned",
                              "anchors", "keep", "has_bbox").collect()
    bad = []
    for r in got:
        wo = spec.strip_bbox(r["text"])
        cleaned = spec.clean_text(wo)
        anchors = spec.extract_anchors(wo)
        mref = r["media_ref"] if r["media_ref"] else None
        keep = spec.classify_keep(r["kind"], cleaned, mref)
        if (r["cleaned"], list(r["anchors"]), r["keep"],
                r["has_bbox"]) != (cleaned, anchors, keep,
                                   spec.parse_bbox(r["text"]) is not None):
            bad.append((r["kind"], r["text"], r["cleaned"], cleaned,
                        r["keep"], keep))
    assert not bad, f"{len(bad)} divergences; first: {bad[0]!r}"
