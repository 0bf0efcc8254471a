"""End-to-end extraction plan: documents(doc_id, spans) -> ordered spans.

Pipeline (SURVEY §3.6):
  read documents -> posexplode spans -> classify (Catalyst, M1)
  -> keep filter -> XY-cut rank for layout docs (applyInPandas, W8)
  -> media-anchor reconciliation + order (joins/windows, M2)
  -> salted per-doc assembly -> (doc_id, spans)

The judged invariant: output spans equal the single-node oracle's
(kind, text, media_ref, order) sequence per doc_id exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.assemble import assemble_spans, with_empty_docs
from ..operators.classify import classify
from ..operators.ordering import assign_rank
from ..operators.reconcile import reconcile_and_order


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> flat (doc_id, kind, text, media_ref, offset)."""
    return (documents
            .select("doc_id", F.explode("spans").alias("s"))
            .select("doc_id",
                    F.col("s.kind").alias("kind"),
                    F.col("s.text").alias("text"),
                    F.col("s.media_ref").alias("media_ref"),
                    F.col("s.offset").alias("offset")))


def extract_flat(documents: DataFrame,
                 persist_intermediate: bool = True) -> DataFrame:
    """Flat judged output: (doc_id, kind, text, media_ref, order).

    The kept table is consumed by multiple downstream branches (layout-id
    build, layout/non-layout rank split, then the media / non-media / claims
    reconcile branches).  Without a persist each branch re-runs the
    regex-heavy classify scan (profiled: rank stage 56s -> ~16s with the
    cache at bench scale).  MEMORY_AND_DISK so an oversized slice spills; at
    cluster scale the equivalent is a DFS checkpoint of the classified table
    between the scan and reconcile phases — same DAG cut, durable instead of
    executor-local.
    """
    spans = explode_spans(documents)
    classified = classify(spans)
    kept = classified.filter(F.col("keep"))
    # normalize media_ref '' -> null so it can't differ from the oracle
    kept = kept.withColumn(
        "media_ref",
        F.when(F.col("media_ref") == "", None).otherwise(F.col("media_ref")))
    if persist_intermediate:
        from pyspark import StorageLevel
        kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
    ranked = assign_rank(kept)
    return reconcile_and_order(ranked)


def extract(documents: DataFrame) -> DataFrame:
    """Nested judged output: (doc_id, spans array<struct<kind,text,media_ref,order>>),
    one row per input doc (empty array when nothing survives)."""
    flat = extract_flat(documents)
    assembled = assemble_spans(flat)
    return with_empty_docs(assembled, documents)
