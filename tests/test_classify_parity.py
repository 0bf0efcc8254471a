"""The Catalyst keep_expr must agree with spec.classify_keep on every input —
this parity is what makes the oracle a valid golden reference."""

import random

import pyspark.sql.functions as F

from vlm_ocr_doc_reader_spark.extraction import spec
from vlm_ocr_doc_reader_spark.operators.classify import classify

KINDS = ["text", "heading", "image", "table", "boilerplate", "link", "weird"]
TEXT_POOL = [
    None, "", "   ", "ok", "read more", "Next",
    "A proper sentence with enough words.",
    "Short.", "Two words", "Two words!",
    "copyright 2024 example corp", "All Rights Reserved",
    "Home | About | Products | Contact", "| | | |",
    "a | b and lots of other words to dilute the pipes here today",
    "Проверка значения реестра на странице.",
    "tabs\tand\nnewlines   collapse",
    "@@bbox:1,2,3,4@@boxed content span here.",
    "@@bbox:10,20,30,40@@",
    "inline [[img_7_1]] anchor span here.",
    "[[tbl_3_0]]", "dangling [[img_x]] ref.",
    "ends with bang!", "ends with q?",
    "trailing spaces   ",
]
MEDIA = [None, "", "img_1", "tbl_2"]


def test_keep_parity_exhaustive_pool(spark):
    rng = random.Random(0)
    rows = []
    i = 0
    for kind in KINDS:
        for text in TEXT_POOL:
            for media in MEDIA:
                rows.append((f"d{i % 7}", kind, text, media, i))
                i += 1
    # plus random word soup
    words = "the spark | data скан read more copyright . ! ?".split(" ")
    for _ in range(300):
        t = " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))
        rows.append((f"d{i % 7}", rng.choice(KINDS), t, rng.choice(MEDIA), i))
        i += 1

    df = spark.createDataFrame(
        rows, "doc_id string, kind string, text string, media_ref string, offset long")
    got = classify(df).select("kind", "text", "media_ref", "offset", "keep",
                              "cleaned").collect()
    for r in got:
        raw = r["text"]
        wo = spec.strip_bbox(raw)
        cleaned = spec.clean_text(wo)
        mref = r["media_ref"] if r["media_ref"] else None
        expected = spec.classify_keep(r["kind"], cleaned, mref)
        assert r["cleaned"] == cleaned, (raw, r["cleaned"], cleaned)
        assert r["keep"] == expected, \
            f"kind={r['kind']!r} text={raw!r} media={r['media_ref']!r}: " \
            f"spark={r['keep']} spec={expected}"


def test_bbox_and_anchor_parsing_parity(spark):
    rows = [("d", "text", t, None, i) for i, t in enumerate(TEXT_POOL) if t]
    df = spark.createDataFrame(
        rows, "doc_id string, kind string, text string, media_ref string, offset long")
    got = classify(df).select("text", "has_bbox", "bx0", "by0", "bx1", "by1",
                              "anchors").collect()
    for r in got:
        bbox = spec.parse_bbox(r["text"])
        assert r["has_bbox"] == (bbox is not None)
        if bbox:
            assert (r["bx0"], r["by0"], r["bx1"], r["by1"]) == bbox
        assert list(r["anchors"]) == spec.extract_anchors(
            spec.strip_bbox(r["text"]))
