"""Adversarial fuzz: hostile span content (regex metachars, malformed bbox
markers, dangling/duplicated anchors, unicode whitespace and digits, shuffled
negative offsets, null fields) must still satisfy the judged invariant on
BOTH execution strategies — exact span-sequence equality vs the oracle.

Offsets stay unique per doc (the input contract: offset IS the span's
position); everything else is fair game.
"""

import random

import pytest

from vlm_ocr_doc_reader_spark.extraction.oracle import extract_doc
from vlm_ocr_doc_reader_spark.plans.extract import extract
from vlm_ocr_doc_reader_spark.sources.readers import DOCUMENTS_SCHEMA

_HOSTILE_TEXT = [
    "", "   ", None, ".", "!", "?", "|", "| | | |",
    "@@bbox:1,2,3,4@@Valid layout text here today.",
    "@@bbox:1,2@@ malformed bbox stays literal.",
    "@@bbox:999999999,0,1,1@@Huge coordinate box.",
    "mid @@bbox:1,2,3,4@@ string marker is not a prefix.",
    "[[img_x_0]] leading anchor with text after it.",
    "dangling [[img_nope_9]] anchor to nothing here.",
    "double [[img_x_0]] claim [[img_x_0]] same host.",
    "nested [[ img_x_0 ]] is not an anchor (spaces).",
    "brackets ]] reversed [[ confuse nothing much.",
    "regex meta ((( *** ??? \\d+ [a-z] $^ usual text.",
    "tab\tand\nnewline\rand\x0bvertical whitespace here.",
    "nbsp\xa0stays\xa0since ascii collapse only works.",
    "unicode digits ١٢٣٤٥٦ and Ⅷ roman numeral stay.",
    "Проверка кириллицы в содержимом документа тут.",
    "emoji 🙂 content 🚀 survives cleaning fine today.",
    "copyright 2026 someone",          # nav pattern -> dropped
    "skip to content",                 # nav pattern -> dropped
    "Short",                           # < MIN_WORDS, no punct -> dropped
    "Ok.",                             # < MIN_WORDS but punct -> kept
    "a | b | c | d | e",               # pipe menu -> dropped
]

_KINDS = ["text", "heading", "image", "table", "boilerplate", "link",
          "blob", None]
_REFS = [None, "", "img_x_0", "tbl_y_1", "img_nope_9", "weird ref"]


def _gen_doc(rng: random.Random, n: int):
    offsets = rng.sample(range(-5, 60), n)  # unique, shuffled, some negative
    spans = []
    for off in offsets:
        kind = rng.choice(_KINDS)
        text = rng.choice(_HOSTILE_TEXT)
        ref = rng.choice(_REFS)
        spans.append((kind, text, ref, off))
    return spans


@pytest.mark.parametrize("seed", [11, 23])
def test_adversarial_corpus_matches_oracle(spark, seed):
    rng = random.Random(seed)
    docs = [(f"adv_{i}", _gen_doc(rng, rng.randint(1, 25)))
            for i in range(60)]
    golden = {d: [tuple(s) for s in extract_doc(sp)] for d, sp in docs}
    df = spark.createDataFrame(docs, DOCUMENTS_SCHEMA)
    for strat in ("fused", "fused_raw", "declarative"):
        got = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"],
                              s["order"]) for s in r["spans"]]
               for r in extract(df, strategy=strat).collect()}
        bad = [d for d in golden if got.get(d) != golden[d]]
        assert not bad, (
            f"{strat}: {len(bad)} docs diverge; first={bad[0]}: "
            f"got={got.get(bad[0])!r} want={golden[bad[0]]!r}")
