"""Media-anchor reconciliation (M2) + final order assignment.

Deterministic replacement for the reference's OCR "resolve" pass
(/root/reference/02_src/vlm_ocr_doc_reader/core/ocr_client.py:202-371 +
core/reader.py:237-408): instead of asking a model to bind each precision
target to its page, we bind each ``[[img_k]]`` / ``[[tbl_k]]`` anchor found
in a text span to the media span carrying that ``media_ref``, and pull the
media span to sit immediately after its (first) anchoring host.

All built-in DataFrame ops — the claim-winner is a top-1-per-key window
(SURVEY W4), the claim→media binding a left equi-join on (doc_id, media_ref).
Both the window and the join partition by doc_id(+ref): well-distributed keys
at any scale; no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MEDIA_KINDS = ("image", "table")


def reconcile_and_order(ranked: DataFrame) -> DataFrame:
    """Input: kept spans with (doc_id, kind, cleaned, media_ref, offset,
    rank, anchors).  Output: (doc_id, kind, text, media_ref, order).
    """
    is_media = F.col("kind").isin(*_MEDIA_KINDS)

    media = ranked.filter(is_media)
    nonmedia = ranked.filter(~is_media)

    # primary media span per (doc_id, media_ref): first by offset — mirrors
    # the oracle's first-occurrence dict insert.
    w_primary = Window.partitionBy("doc_id", "media_ref").orderBy("offset")
    media = media.withColumn("is_primary",
                             F.row_number().over(w_primary) == 1)

    # anchor claims from non-media spans; winner = min (host_rank, anchor_pos)
    claims = (nonmedia
              .select("doc_id", F.col("rank").alias("host_rank"),
                      F.posexplode("anchors").alias("anchor_pos", "ref")))
    w_claim = Window.partitionBy("doc_id", "ref").orderBy("host_rank",
                                                          "anchor_pos")
    claims = (claims.withColumn("rn", F.row_number().over(w_claim))
                    .filter(F.col("rn") == 1)
                    .drop("rn"))

    media_keyed = (media.join(
        claims, (media.doc_id == claims.doc_id)
                & (media.media_ref == claims.ref)
                & media.is_primary, "left")
        .select(media["*"],
                F.col("host_rank"), F.col("anchor_pos"))
        .withColumn("k1", F.coalesce(F.col("host_rank"), F.col("rank")))
        .withColumn("k2", F.when(F.col("host_rank").isNotNull(), 1).otherwise(0))
        .withColumn("k3", F.coalesce(F.col("anchor_pos"), F.lit(0))))

    nonmedia_keyed = (nonmedia
                      .withColumn("k1", F.col("rank"))
                      .withColumn("k2", F.lit(0))
                      .withColumn("k3", F.lit(0)))

    cols = ["doc_id", "kind", "cleaned", "media_ref", "offset",
            "k1", "k2", "k3"]
    all_spans = nonmedia_keyed.select(*cols).unionByName(
        media_keyed.select(*cols))

    w_order = Window.partitionBy("doc_id").orderBy("k1", "k2", "k3", "offset")
    return (all_spans
            .withColumn("order", F.row_number().over(w_order) - 1)
            .select("doc_id", "kind",
                    F.col("cleaned").alias("text"),
                    "media_ref",
                    F.col("order").cast("int").alias("order")))
