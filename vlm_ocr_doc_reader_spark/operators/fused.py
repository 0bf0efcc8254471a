"""Fused per-document extraction stage (scale/throughput path).

The declarative pipeline (`operators/ordering` + `reconcile` + `assemble`)
expresses ordering/reconciliation as joins + windows — the canonical
Catalyst-visible form.  Measured at bench scale its wall time is dominated by
the multi-branch stage graph, not by compute.  Everything after
classification is, however, *per-document* logic with tiny per-doc state —
the textbook case for one grouped Arrow stage:

    classified spans --(one shuffle by doc_id)--> applyInPandas(doc logic)

The per-doc logic below reuses the exact shared rules (`spec.xy_cut_order`,
claim semantics) and is covered by the same golden tests plus an
equivalence test against the declarative path, so the two strategies cannot
drift.  Mega docs (10^4-10^5 spans) are a single group here — acceptable
because the per-doc work is O(n log n) and the group payload is bounded by
the largest document, mirroring the reference's one-document-per-process
model (core/reader.py:37-48); the salted declarative path remains available
when single-doc payloads exceed worker memory.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame

from ..extraction import spec

_OUT_SCHEMA = ("doc_id string, kind string, text string, media_ref string, "
               "order int")


def _extract_one_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    """One document's kept spans -> ordered output spans.

    Input columns: doc_id, kind, cleaned, media_ref, offset, anchors,
    bx0..by1 (nullable).  Mirrors oracle.extract_doc exactly from the
    post-classification point on.
    """
    pdf = pdf.sort_values("offset").reset_index(drop=True)
    n = len(pdf)
    kinds = pdf["kind"].tolist()
    offsets = pdf["offset"].tolist()
    media_refs = pdf["media_ref"].tolist()
    anchors = pdf["anchors"].tolist()

    # reading rank: XY-cut when every span has a bbox, else offset
    if n and pdf["bx0"].notna().all():
        boxes = list(zip(pdf["bx0"].astype(int), pdf["by0"].astype(int),
                         pdf["bx1"].astype(int), pdf["by1"].astype(int)))
        perm = spec.xy_cut_order(boxes)
        rank = [0] * n
        for r, i in enumerate(perm):
            rank[i] = r
    else:
        rank = offsets

    media_first: dict = {}
    for i in range(n):
        if kinds[i] in ("image", "table") and media_refs[i] not in media_first:
            media_first[media_refs[i]] = i
    claims: dict = {}
    for i in range(n):
        if kinds[i] in ("image", "table"):
            continue
        for pos, ref in enumerate(anchors[i] if anchors[i] is not None else ()):
            if ref in media_first:
                cand = (rank[i], pos)
                if ref not in claims or cand < claims[ref]:
                    claims[ref] = cand

    def key(i: int):
        if kinds[i] in ("image", "table"):
            c = claims.get(media_refs[i])
            if c is not None and media_first[media_refs[i]] == i:
                return (c[0], 1, c[1], offsets[i])
        return (rank[i], 0, 0, offsets[i])

    order = sorted(range(n), key=key)
    out = pdf.iloc[order][["doc_id", "kind", "cleaned", "media_ref"]].copy()
    out.columns = ["doc_id", "kind", "text", "media_ref"]
    out["order"] = range(n)
    return out


_NESTED_SCHEMA = ("doc_id string, spans array<struct<kind:string,"
                  "text:string,media_ref:string,order:int>>")


def _oracle_one_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    """One document's RAW spans -> (doc_id, spans) by running the shared
    single-node extraction (`extraction.oracle.extract_doc`) on the group.
    Zero-drift by construction: the distributed path and the golden oracle
    are the same function.

    Arrow hands nullable int offsets to pandas as float NaN — map those back
    to None so extract_doc's quarantine (not a float-cast crash) handles
    them, exactly as the row-wise strategies do."""
    from ..extraction.oracle import extract_doc
    pdf = pdf.sort_values("offset")
    offsets = [None if pd.isna(o) else int(o) for o in pdf["offset"]]
    spans = list(zip(pdf["kind"].tolist(), pdf["text"].tolist(),
                     pdf["media_ref"].tolist(), offsets))
    out = extract_doc(spans)
    return pd.DataFrame({
        "doc_id": [pdf["doc_id"].iloc[0]],
        "spans": [[{"kind": k, "text": t, "media_ref": m, "order": o}
                   for k, t, m, o in out]],
    })


# --- RE2-safe twins of the spec regexes (Arrow compute kernels run RE2,
# --- not Python sre).  Divergence hazards handled explicitly:
# ---   * Python re.ASCII \s == [ \t\n\r\f\v]; RE2 \s LACKS \v -> spell the
# ---     class out;
# ---   * Python re.ASCII \d == [0-9]; RE2 \d is [0-9] by default but the
# ---     explicit class removes any doubt;
# ---   * extract_regex needs named groups.
# --- Parity with the sre originals is enforced by the strategy-equality,
# --- golden, adversarial-fuzz, and unicode-parity suites.
_BBOX_RE2 = (r"^@@bbox:(?P<x0>[0-9]+),(?P<y0>[0-9]+),"
             r"(?P<x1>[0-9]+),(?P<y1>[0-9]+)@@")
_BBOX_RE2_SUB = r"^@@bbox:[0-9]+,[0-9]+,[0-9]+,[0-9]+@@"
_ANCHOR_RE2 = spec.ANCHOR_RE          # no \s/\d classes — RE2-identical
_NAV_RE2 = spec.NAV_RE                # escaped ASCII literals
_WS_RE2 = r"[ \t\n\r\f\v]+"


def _extract_arrow_batch(doc_ids, spans):
    """One Arrow RecordBatch column pair -> list of per-doc OutSpan lists.

    The per-SPAN stage (quarantine, bbox parse/strip, cleaning, keep
    classification) runs entirely in Arrow C++ kernels over the flattened
    span table — no Python object materializes for a span that
    classification drops.  Anchor findall (no Arrow kernel exists) runs
    scalar-Python but only on spans that contain '[[' (the same fast-path
    gate the scalar spec uses).  The per-DOC stage converts only KEPT spans
    to Python and calls the shared ``oracle.order_kept`` — ordering has
    exactly one implementation."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..extraction.oracle import order_kept

    n_docs = len(doc_ids)
    out = [[] for _ in range(n_docs)]
    if n_docs == 0:
        return out
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()
    if len(flat) == 0:
        return out
    kind = flat.field("kind")
    text = flat.field("text")
    mref = flat.field("media_ref")
    off = flat.field("offset")

    # quarantine (P5: null kind/offset) + outright boiler/link drop
    mask = pc.and_kleene(
        pc.and_kleene(pc.is_valid(kind), pc.is_valid(off)),
        pc.invert(pc.fill_null(
            pc.is_in(kind, value_set=pa.array(["boilerplate", "link"])),
            True)))
    mask = pc.fill_null(mask, False)
    sel = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    if len(sel) == 0:
        return out
    idx = pa.array(sel)
    kind, text, mref, off = (c.take(idx) for c in (kind, text, mref, off))
    parent = parent[sel]

    t = pc.coalesce(text, "")
    bbox_grp = pc.extract_regex(t, _BBOX_RE2)
    wo = pc.replace_substring_regex(t, _BBOX_RE2_SUB, "")
    cleaned = pc.utf8_trim(
        pc.replace_substring_regex(
            pc.replace_substring_regex(wo, _ANCHOR_RE2, " "),
            _WS_RE2, " "),
        spec._ASCII_WS)

    # classification (spec.classify_keep, kernel form)
    nonempty = pc.not_equal(cleaned, "")
    mref_ok = pc.fill_null(pc.not_equal(mref, ""), False)
    is_media = pc.is_in(kind, value_set=pa.array(["image", "table"]))
    keep = pc.and_(is_media, mref_ok)
    keep = pc.or_(keep, pc.and_(pc.equal(kind, "heading"), nonempty))
    low = pc.utf8_lower(cleaned)
    nav = pc.match_substring_regex(low, _NAV_RE2)
    nwords = pc.add(pc.count_substring(cleaned, " "), 1)
    pipes = pc.count_substring(cleaned, "|")
    ends = pc.is_in(pc.utf8_slice_codeunits(cleaned, start=-1, stop=2**30),
                    value_set=pa.array(list(spec.SENTENCE_END)))
    text_keep = pc.and_(pc.and_(pc.equal(kind, "text"), nonempty),
                        pc.and_(pc.invert(nav), pc.and_(
                            pc.invert(pc.greater(
                                pc.cast(pipes, "double"),
                                pc.multiply(pc.cast(nwords, "double"),
                                            spec.PIPE_RATIO))),
                            pc.or_(pc.greater_equal(nwords,
                                                    spec.MIN_WORDS),
                                   ends))))
    keep = pc.or_(keep, text_keep)

    kept = np.flatnonzero(pc.fill_null(keep, False).to_numpy(
        zero_copy_only=False))
    if len(kept) == 0:
        return out
    kidx = pa.array(kept)

    # only KEPT spans become Python objects
    k_kind = kind.take(kidx).to_pylist()
    k_clean = cleaned.take(kidx).to_pylist()
    k_mref = mref.take(kidx).to_pylist()
    k_off = off.take(kidx).to_numpy(zero_copy_only=False).astype("int64")
    k_parent = parent[kept]
    bb = bbox_grp.take(kidx)
    bb_valid = pc.is_valid(bb).to_numpy(zero_copy_only=False)
    # numeric bbox fields via cast->numpy: no per-span Python objects
    # (non-matching rows are struct-null but their CHILD slots hold "" —
    # mask to a parseable sentinel before the cast)
    bb_valid_a = pc.is_valid(bb)
    bb_f = [pc.cast(pc.if_else(bb_valid_a, bb.field(g), "-1"), "int64")
            .to_numpy(zero_copy_only=False)
            for g in ("x0", "y0", "x1", "y1")]
    # anchors exist only where the pre-bbox-stripped text contains '[[' —
    # materialize Python strings for exactly those spans
    k_wo_arr = wo.take(kidx)
    anch_mask = pc.match_substring(k_wo_arr, "[[").to_numpy(
        zero_copy_only=False)
    anch_rows = np.flatnonzero(anch_mask)
    anch_map = {int(i): spec._anchor_c.findall(s) for i, s in zip(
        anch_rows, k_wo_arr.take(pa.array(anch_rows)).to_pylist())} \
        if len(anch_rows) else {}

    is_media_k = pc.is_in(kind.take(kidx),
                          value_set=pa.array(["image", "table"])) \
        .to_numpy(zero_copy_only=False)

    order = np.lexsort((k_off, k_parent))
    sorted_parent = k_parent[order]
    bounds = np.flatnonzero(np.diff(sorted_parent)) + 1
    for grp in np.split(order, bounds):
        di = int(k_parent[grp[0]])
        # FAST PATH (the common, non-layout, non-media document): with no
        # media spans there are no claims, and without a full bbox cover
        # rank == offset — the final order IS the offset order we already
        # iterate in, so the output tuples are emitted directly (no dicts,
        # no order_kept).  Semantically identical by the order_kept rules;
        # equality is enforced by the strategy-equivalence suites.
        if not is_media_k[grp].any() and not bb_valid[grp].all():
            out[di] = [
                (k_kind[p], k_clean[p], (k_mref[p] or None), i)
                for i, p in enumerate(map(int, grp))]
            continue
        group = []
        for pos in map(int, grp):
            m = k_mref[pos]
            group.append({
                "kind": k_kind[pos],
                "text": k_clean[pos],
                "media_ref": m if m else None,
                "offset": int(k_off[pos]),
                "bbox": ((int(bb_f[0][pos]), int(bb_f[1][pos]),
                          int(bb_f[2][pos]), int(bb_f[3][pos]))
                         if bb_valid[pos] else None),
                "anchors": anch_map.get(pos, []),
            })
        out[di] = order_kept(group)
    return out


def extract_batch(spans_lists: list) -> list:
    """Vectorized batch extraction over plain Python span lists (one per
    doc) — converts to Arrow once and runs ``_extract_arrow_batch``.
    Returns a list of OutSpan-tuple lists.  Kept as the Python-side entry
    for tests; the Spark path feeds Arrow batches directly (zero object
    churn for dropped spans)."""
    import pyarrow as pa
    lt = pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string()),
                             ("media_ref", pa.string()),
                             ("offset", pa.int64())]))
    spans = pa.array(
        [None if sp is None else
         [{"kind": s["kind"], "text": s["text"],
           "media_ref": s["media_ref"], "offset": s["offset"]} for s in sp]
         for sp in spans_lists], type=lt)
    return _extract_arrow_batch(list(range(len(spans_lists))), spans)


def fused_extract_rows(documents: DataFrame) -> DataFrame:
    """(doc_id, spans) -> (doc_id, spans) with ZERO shuffle.

    The input table already co-locates each document's spans in one row —
    the grouping the declarative path reconstructs with an exchange is free
    here.  So the scale plan is a pure ``mapInArrow`` map: scan -> Arrow
    batch -> kernel-vectorized batch extraction (``_extract_arrow_batch``)
    -> write.  Embarrassingly parallel, no exchange, no skew (a mega doc is
    one row; Arrow batch size bounds worker memory).  Rows map 1:1, so
    empty/all-boilerplate docs keep their row with an empty spans array
    (the judged contract).
    """
    import pyarrow as pa

    out_type = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("order", pa.int32())]))

    def batches(it):
        for rb in it:
            doc_ids = rb.column(0)
            results = _extract_arrow_batch(doc_ids, rb.column(1))
            spans_out = pa.array(
                [[{"kind": k, "text": t, "media_ref": m, "order": o}
                  for k, t, m, o in res] for res in results],
                type=out_type)
            yield pa.RecordBatch.from_arrays([doc_ids, spans_out],
                                             names=["doc_id", "spans"])

    return documents.select("doc_id", "spans").mapInArrow(
        batches, schema=_NESTED_SCHEMA)


def fused_extract_rows_scalar(documents: DataFrame) -> DataFrame:
    """Row-at-a-time reference form of ``fused_extract_rows``: calls the
    scalar golden oracle per document.  Kept as the drift guard the
    vectorized default is tested against (test_strategies_equal) and as the
    fallback while debugging batch-shape issues."""
    from ..extraction.oracle import extract_doc

    def batches(it: "Iterable[pd.DataFrame]"):
        for pdf in it:
            out_spans = []
            for spans in pdf["spans"]:
                if spans is None:
                    out_spans.append([])
                    continue
                lst = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                       for s in spans]
                out = extract_doc(lst)
                out_spans.append(
                    [{"kind": k, "text": t, "media_ref": m, "order": o}
                     for k, t, m, o in out])
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "spans": out_spans})

    return documents.select("doc_id", "spans").mapInPandas(
        batches, schema=_NESTED_SCHEMA)


def fused_extract_raw(raw_spans: DataFrame) -> DataFrame:
    """(doc_id, kind, text, media_ref, offset) RAW -> (doc_id, spans).

    The throughput plan: one cheap JVM projection+prefilter (boilerplate and
    link kinds drop row-wise before the exchange — same outcome as the full
    classifier for those kinds, so the shuffle only carries candidate
    spans), ONE hash exchange on doc_id, one grouped Arrow stage running the
    shared per-doc extraction.  All heavy work is in the embarrassingly-
    parallel grouped stage, which is what scales linearly with cores.

    Contract repair: a doc whose spans are ALL pruned loses its group (no
    input rows -> no output row), so the distinct doc_id set is unioned back
    with empty span arrays — same (doc_id, empty spans) contract as the
    fused-rows and declarative strategies (tested in test_strategies_equal).
    The distinct is a narrow one-column agg, cheap next to the grouped stage.
    """
    from pyspark.sql import functions as F
    pruned = raw_spans.filter(
        F.col("kind").isNull() | ~F.col("kind").isin("boilerplate", "link"))
    out = (pruned.groupBy("doc_id")
           .applyInPandas(_oracle_one_doc, schema=_NESTED_SCHEMA))
    ids = raw_spans.select("doc_id").distinct()
    missing = (ids.join(out.select("doc_id"), "doc_id", "left_anti")
               .withColumn(
                   "spans",
                   F.array().cast("array<struct<kind:string,text:string,"
                                  "media_ref:string,order:int>>")))
    return out.unionByName(missing)


def _extract_one_doc_nested(pdf: pd.DataFrame) -> pd.DataFrame:
    out = _extract_one_doc(pdf)
    spans = [{"kind": k, "text": t, "media_ref": m, "order": o}
             for k, t, m, o in zip(out["kind"], out["text"],
                                   out["media_ref"], out["order"])]
    return pd.DataFrame({"doc_id": [pdf["doc_id"].iloc[0]],
                         "spans": [spans]})


def fused_extract_nested(kept: DataFrame) -> DataFrame:
    """(classified kept spans) -> (doc_id, spans) in ONE grouped Arrow
    stage — ordering, reconciliation, and assembly fused per document."""
    cols = ["doc_id", "kind", "cleaned", "media_ref", "offset", "anchors",
            "bx0", "by0", "bx1", "by1"]
    return (kept.select(*cols)
            .groupBy("doc_id")
            .applyInPandas(_extract_one_doc_nested, schema=_NESTED_SCHEMA))


def fused_reconcile_order(kept: DataFrame) -> DataFrame:
    """(classified kept spans) -> flat ordered spans, one grouped Arrow
    stage.  Columns consumed: doc_id, kind, cleaned, media_ref, offset,
    anchors, bx0, by0, bx1, by1."""
    cols = ["doc_id", "kind", "cleaned", "media_ref", "offset", "anchors",
            "bx0", "by0", "bx1", "by1"]
    return (kept.select(*cols)
            .groupBy("doc_id")
            .applyInPandas(_extract_one_doc, schema=_OUT_SCHEMA))
