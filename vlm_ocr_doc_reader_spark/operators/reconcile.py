"""Media-anchor reconciliation (M2) + final order assignment.

Deterministic replacement for the reference's OCR "resolve" pass
(/root/reference/02_src/vlm_ocr_doc_reader/core/ocr_client.py:202-371 +
core/reader.py:237-408): each ``[[img_k]]`` / ``[[tbl_k]]`` anchor found in a
text span claims the media span carrying that ``media_ref``; the claimed
media span is pulled to sit immediately after its (first) anchoring host.

Physical shape (single pass over the big table):
  * two tiny side-aggregates — claim winners (top-1-per-(doc,ref) window,
    SURVEY W4) and first-occurrence media offsets (min agg) — are joined
    into one ``binding`` table with at most one row per (doc_id, media_ref);
  * the big span table is LEFT-joined against ``binding`` on
    (doc_id, media_ref, offset == first_offset), so only the primary media
    row binds; AQE converts this to a broadcast join when binding is small
    and to a shuffle join at corpus scale — no hint pinned;
  * the only full shuffle is the final per-doc ordering window.
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

    # claim winner per (doc_id, ref): min (host_rank, anchor_pos) — mirrors
    # oracle first-claim-wins (voting-style top-1-per-key).
    claims = (ranked
              .filter(~is_media & (F.size("anchors") > 0))
              .select("doc_id", F.col("rank").alias("host_rank"),
                      F.posexplode("anchors").alias("anchor_pos", "ref")))
    w_claim = Window.partitionBy("doc_id", "ref").orderBy("host_rank",
                                                          "anchor_pos")
    claims = (claims.withColumn("rn", F.row_number().over(w_claim))
                    .filter(F.col("rn") == 1).drop("rn"))

    # primary media occurrence = min offset per (doc_id, media_ref)
    media_first = (ranked.filter(is_media)
                   .groupBy("doc_id", F.col("media_ref").alias("ref"))
                   .agg(F.min("offset").alias("first_offset")))

    binding = (claims.join(media_first, ["doc_id", "ref"])
               .select("doc_id", F.col("ref").alias("media_ref"),
                       "first_offset", "host_rank", "anchor_pos"))

    b = binding.alias("b")
    r = ranked.alias("r")
    joined = r.join(
        b, (F.col("r.doc_id") == F.col("b.doc_id"))
           & (F.col("r.media_ref") == F.col("b.media_ref"))
           & (F.col("r.offset") == F.col("b.first_offset")),
        "left")

    bound = F.col("b.host_rank").isNotNull()
    keyed = joined.select(
        F.col("r.doc_id").alias("doc_id"), F.col("r.kind").alias("kind"),
        F.col("r.cleaned").alias("cleaned"),
        F.col("r.media_ref").alias("media_ref"),
        F.col("r.offset").alias("offset"),
        F.when(bound, F.col("b.host_rank")).otherwise(F.col("r.rank"))
         .alias("k1"),
        F.when(bound, F.lit(1)).otherwise(F.lit(0)).alias("k2"),
        F.coalesce(F.col("b.anchor_pos"), F.lit(0)).alias("k3"))

    w_order = Window.partitionBy("doc_id").orderBy("k1", "k2", "k3", "offset")
    return (keyed
            .withColumn("order", F.row_number().over(w_order) - 1)
            .select("doc_id", "kind",
                    F.col("cleaned").alias("text"),
                    "media_ref",
                    F.col("order").cast("int").alias("order")))
