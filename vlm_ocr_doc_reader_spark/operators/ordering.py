"""Reading-order assignment (W8): offset order, XY-cut for layout docs.

The reference's only ordering is 1-based page order
(/root/reference/02_src/vlm_ocr_doc_reader/preprocessing/renderer.py:89-90,
core/reader.py:148); within a page it trusts the VLM's emission order.  The
new engine makes reading order explicit: layout (PDF-derived) documents carry
bboxes and get recursive XY-cut ordering; everything else keeps input offset
order.

Plan shape (chosen after profiling — see BENCH.md history):
  * non-layout docs (the overwhelming majority, incl. all mega docs) take
    ``rank = offset`` with NO shuffle at all;
  * the layout slice is isolated by a broadcast semi/anti join on the small
    distinct layout-doc-id set (docs with any bbox span), then grouped
    ``applyInPandas`` computes XY-cut *and returns the rows themselves* with
    their rank — no join-back of ranks onto the wide table.

XY-cut is per-document imperative logic — the one place we leave Catalyst.
Layout docs are page-bounded (the reference renders pages,
renderer.py:35-96), so a group is at most a few hundred rows — no skew;
mega-docs are non-layout by construction and never enter the UDF.  At a
scale where the layout-id set outgrows the broadcast threshold, swap the
hint for a shuffle semi-join — the structure is unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extraction import spec

# columns flowing through the ordering stage (kept table projection)
_THRU = ["doc_id", "kind", "cleaned", "media_ref", "offset", "anchors"]
_RANKED_SCHEMA = ("doc_id string, kind string, cleaned string, "
                  "media_ref string, offset int, anchors array<string>, "
                  "rank int")


def _xycut_rows(pdf: pd.DataFrame) -> pd.DataFrame:
    """One layout document: XY-cut over bboxes -> rank column.

    Mixed docs (some span lost its bbox) fall back to offset order, exactly
    like ``oracle.extract_doc`` (layout iff ALL kept spans carry a bbox).
    """
    pdf = pdf.sort_values("offset").reset_index(drop=True)  # pin tie order
    if pdf["bx0"].isna().any():
        out = pdf[_THRU].copy()
        out["rank"] = pdf["offset"].astype("int32")
        return out
    boxes = list(zip(pdf["bx0"].astype(int), pdf["by0"].astype(int),
                     pdf["bx1"].astype(int), pdf["by1"].astype(int)))
    perm = spec.xy_cut_order(boxes)
    out = pdf.iloc[perm][_THRU].copy()
    out["rank"] = range(len(perm))
    return out


def assign_rank(kept: DataFrame) -> DataFrame:
    """Add ``rank`` (reading-order key) to the kept span table.

    Input columns: _THRU + has_bbox + bx0..by1; output: _RANKED_SCHEMA.
    """
    layout_ids = (kept.filter(F.col("has_bbox"))
                  .select("doc_id").distinct())

    non_layout = (kept.join(F.broadcast(layout_ids), "doc_id", "left_anti")
                  .select(*_THRU,
                          F.col("offset").cast("int").alias("rank")))

    layout = kept.join(F.broadcast(layout_ids), "doc_id", "left_semi")
    ranked_layout = (layout
                     .select(*_THRU, "bx0", "by0", "bx1", "by1")
                     .groupBy("doc_id")
                     .applyInPandas(_xycut_rows, schema=_RANKED_SCHEMA))

    return non_layout.select(*_THRU, "rank").unionByName(
        ranked_layout.select(*_THRU, "rank"))
