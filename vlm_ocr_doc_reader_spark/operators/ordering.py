"""Reading-order assignment (W8): offset order, XY-cut for layout docs.

The reference's only ordering is 1-based page order
(/root/reference/02_src/vlm_ocr_doc_reader/preprocessing/renderer.py:89-90,
core/reader.py:148); within a page it trusts the VLM's emission order.  The
new engine makes reading order explicit: layout (PDF-derived) documents carry
bboxes and get recursive XY-cut ordering; everything else keeps input offset
order.

XY-cut is per-document imperative logic — the one place we leave Catalyst.
It runs as ``applyInPandas`` grouped by doc_id over ONLY the layout subset
(filter pushed before the shuffle, so at 100 TB the grouped exchange carries
just the small layout slice, not the whole corpus).  Layout docs are
page-bounded (the reference renders pages, renderer.py:35-96), so a group is
at most a few hundred rows — no skew risk; mega-docs are non-layout by
construction and never enter this operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..extraction import spec

_RANK_SCHEMA = "doc_id string, offset int, rank int"


def _xycut_one_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    boxes = list(zip(pdf["bx0"].astype(int), pdf["by0"].astype(int),
                     pdf["bx1"].astype(int), pdf["by1"].astype(int)))
    perm = spec.xy_cut_order(boxes)
    out = pd.DataFrame({
        "doc_id": pdf["doc_id"].iloc[:1].repeat(len(perm)).reset_index(drop=True),
        "offset": pdf["offset"].iloc[perm].reset_index(drop=True),
        "rank": range(len(perm)),
    })
    return out


def assign_rank(kept: DataFrame) -> DataFrame:
    """Add ``rank`` (reading order key) to the kept span table.

    A doc is "layout" when ALL of its kept spans carry a bbox (mirrors
    ``oracle.extract_doc``).  Non-layout rank = offset.
    """
    is_layout = (F.min(F.col("has_bbox").cast("int"))
                  .over(Window.partitionBy("doc_id")) == 1)
    df = kept.withColumn("is_layout", is_layout)

    layout = df.filter(F.col("is_layout")).select("doc_id", "offset",
                                                  "bx0", "by0", "bx1", "by1")
    ranks = layout.groupBy("doc_id").applyInPandas(
        lambda pdf: _xycut_one_doc(pdf), schema=_RANK_SCHEMA)

    out = (df.join(ranks, ["doc_id", "offset"], "left")
             .withColumn("rank", F.coalesce(F.col("rank"), F.col("offset"))))
    return out
