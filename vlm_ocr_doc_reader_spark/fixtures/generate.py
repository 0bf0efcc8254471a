"""Deterministic synthetic corpus generator (FIXTURES.md §1).

Emits the judged input table ``documents(doc_id string,
spans array<struct<kind string, text string, media_ref string, offset int>>)``
with the content slices from FIXTURES.md: plain, boilerplate-heavy,
interleaved-media, layout (bbox-carrying, shuffled visual order), mega-doc
skew, and fixed edge cases.  Seeded — same (seed, n_docs) always produces the
identical corpus, so golden tests and benches are reproducible with no
external data.
"""

from __future__ import annotations

import random
from typing import List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

InSpan = Tuple[str, Optional[str], Optional[str], int]

_WORDS = (
    "spark data query plan shuffle partition join filter scan merge sort "
    "window batch stream table row column key value hash range broadcast "
    "скан документ страница реестр значение контекст проверка уровень "
    "extraction pipeline document content heading figure caption result"
).split()

_BOILER = [
    "Home | About | Products | Contact",
    "copyright 2024 example corp",
    "All Rights Reserved worldwide",
    "Privacy Policy and Terms of Service apply",
    "cookie settings",
    "skip to content",
    "back to top",
    "| | | |",
]

_SHORT_JUNK = ["ok", "read more", "next", "prev", "12", "···"]


def _sentence(rng: random.Random, lo: int = 4, hi: int = 18) -> str:
    n = rng.randint(lo, hi)
    words = [rng.choice(_WORDS) for _ in range(n)]
    return " ".join(words).capitalize() + rng.choice([".", ".", ".", "!", "?"])


def _heading(rng: random.Random) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 5))).title()


def _gen_plain(rng: random.Random) -> List[InSpan]:
    n = rng.randint(5, 50)
    spans: List[InSpan] = []
    for i in range(n):
        r = rng.random()
        if r < 0.12:
            spans.append(("heading", _heading(rng), None, i))
        elif r < 0.2:
            spans.append(("text", rng.choice(_SHORT_JUNK), None, i))
        else:
            spans.append(("text", _sentence(rng), None, i))
    return spans


def _gen_boiler(rng: random.Random) -> List[InSpan]:
    n = rng.randint(20, 100)
    spans: List[InSpan] = []
    for i in range(n):
        r = rng.random()
        if r < 0.30:
            spans.append(("boilerplate", rng.choice(_BOILER), None, i))
        elif r < 0.50:
            spans.append(("link", "read more about " + rng.choice(_WORDS), None, i))
        elif r < 0.62:  # boilerplate disguised as text — classifier must catch
            spans.append(("text", rng.choice(_BOILER), None, i))
        elif r < 0.70:
            spans.append(("heading", _heading(rng), None, i))
        else:
            spans.append(("text", _sentence(rng), None, i))
    return spans


def _gen_media(rng: random.Random, doc_idx: int) -> List[InSpan]:
    """Interleaved media: anchors inside text; media spans parked at the end
    (out of place) so reconciliation must move them."""
    n_text = rng.randint(6, 30)
    n_media = rng.randint(1, min(6, n_text))
    refs = [f"{'img' if rng.random() < 0.7 else 'tbl'}_{doc_idx}_{k}"
            for k in range(n_media)]
    spans: List[InSpan] = []
    anchor_hosts = sorted(rng.sample(range(n_text), n_media))
    ref_iter = iter(refs)
    for i in range(n_text):
        t = _sentence(rng)
        if i in anchor_hosts:
            ref = next(ref_iter)
            cut = rng.randint(0, len(t))
            t = t[:cut] + f" [[{ref}]] " + t[cut:]
        spans.append(("text", t, None, i))
    inplace = rng.random() < 0.3
    for k, ref in enumerate(refs):
        kind = "image" if ref.startswith("img") else "table"
        caption = _sentence(rng, 2, 6) if rng.random() < 0.5 else ""
        spans.append((kind, caption, ref, n_text + k))
    if rng.random() < 0.2:  # dangling anchor to a nonexistent ref
        i = rng.randrange(n_text)
        kind, t, m, off = spans[i]
        spans[i] = (kind, t + f" [[img_{doc_idx}_missing]]", m, off)
    _ = inplace
    return spans


def _gen_layout(rng: random.Random) -> List[InSpan]:
    """PDF-derived two-column page(s): emit spans in SHUFFLED visual order;
    every span carries a bbox prefix.  Oracle/engine restore reading order
    via XY-cut."""
    n_pages = rng.randint(1, 3)
    blocks = []  # (reading_order_key, kind, text, bbox)
    page_h = 1000
    for p in range(n_pages):
        y_base = p * (page_h + 100)
        # title across both columns
        blocks.append(("heading", _heading(rng),
                       (100, y_base + 10, 900, y_base + 60)))
        for col, x0 in ((0, 100), (1, 520)):
            y = y_base + 100
            for _ in range(rng.randint(2, 6)):
                h = rng.randint(40, 120)
                blocks.append(("text", _sentence(rng), (x0, y, x0 + 380, y + h)))
                y += h + 20
    order = list(range(len(blocks)))
    rng.shuffle(order)
    spans: List[InSpan] = []
    for i, bi in enumerate(order):
        kind, text, (x0, y0, x1, y1) = blocks[bi]
        spans.append((kind, f"@@bbox:{x0},{y0},{x1},{y1}@@{text}", None, i))
    return spans


def _gen_mega(rng: random.Random, n_spans: int) -> List[InSpan]:
    spans: List[InSpan] = []
    for i in range(n_spans):
        r = rng.random()
        if r < 0.05:
            spans.append(("heading", _heading(rng), None, i))
        elif r < 0.15:
            spans.append(("boilerplate", rng.choice(_BOILER), None, i))
        else:
            spans.append(("text", _sentence(rng), None, i))
    return spans


_EDGE_DOCS: List[Tuple[str, List[InSpan]]] = [
    ("edge_empty", []),
    ("edge_one", [("text", "A single solitary sentence stands here.", None, 0)]),
    ("edge_all_boiler", [("boilerplate", b, None, i) for i, b in enumerate(_BOILER)]),
    ("edge_dup_text", [("text", "Duplicate content sentence here.", None, 0),
                       ("text", "Duplicate content sentence here.", None, 1)]),
    ("edge_empty_strings", [("text", "", None, 0), ("text", "   ", None, 1),
                            ("heading", "", None, 2), ("text", None, None, 3)]),
    ("edge_media_no_ref", [("image", "orphan caption", None, 0),
                           ("text", "Real content sentence follows here.", None, 1)]),
    ("edge_unicode", [("text", "Проверка значения реестра на странице три.", None, 0),
                      ("heading", "Раздел Один", None, 1),
                      ("text", "O0l1 I1S5B8 mixed — ok.", None, 2)]),
    ("edge_anchor_dup", [("text", "First [[img_e_1]] mention wins here.", None, 0),
                         ("text", "Second [[img_e_1]] mention is stripped only.", None, 1),
                         ("image", "the figure", "img_e_1", 2)]),
]


def generate_documents(n_docs: int, seed: int = 42,
                       mega_spans: int = 10_000,
                       include_edge: bool = True):
    """Return list of (doc_id, [InSpan...]) — deterministic for (n_docs, seed)."""
    docs: List[Tuple[str, List[InSpan]]] = []
    if include_edge:
        docs.extend(_EDGE_DOCS)
    n_mega = max(3, n_docs // 1000)
    for i in range(n_docs):
        rng = random.Random(seed * 1_000_003 + i)  # per-doc stream: order-independent
        doc_id = f"doc_{i:08d}"
        if i < n_mega:
            docs.append((doc_id, _gen_mega(rng, mega_spans)))
            continue
        r = rng.random()
        if r < 0.60:
            docs.append((doc_id, _gen_plain(rng)))
        elif r < 0.75:
            docs.append((doc_id, _gen_boiler(rng)))
        elif r < 0.90:
            docs.append((doc_id, _gen_media(rng, i)))
        else:
            docs.append((doc_id, _gen_layout(rng)))
    return docs


SPAN_ARROW_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
]))


def write_documents_parquet(docs, path: str, row_group_docs: int = 2000,
                            shards: int = 1) -> None:
    """Write (doc_id, spans) to parquet with the judged input schema.

    ``shards`` > 1 writes a directory of N files (round-robin by index, so
    mega docs spread across shards) — a single monolithic file caps Spark's
    scan parallelism at its row-group count."""
    import os
    schema = pa.schema([("doc_id", pa.string()), ("spans", SPAN_ARROW_TYPE)])

    def dump(sub, fp):
        writer = pq.ParquetWriter(fp, schema)
        try:
            for lo in range(0, len(sub), row_group_docs):
                chunk = sub[lo:lo + row_group_docs]
                ids = [d for d, _ in chunk]
                spans = [[{"kind": k, "text": t, "media_ref": m, "offset": o}
                          for k, t, m, o in sp] for _, sp in chunk]
                writer.write_table(pa.table({"doc_id": ids, "spans": spans},
                                            schema=schema))
        finally:
            writer.close()

    if shards <= 1:
        dump(docs, path)
        return
    os.makedirs(path, exist_ok=True)
    for s in range(shards):
        dump(docs[s::shards], os.path.join(path, f"part-{s:05d}.parquet"))
