"""The reference's front-door artifact: ``full_description``.

The reference CLI's primary output is a ``DocumentData`` object —
``{text, structure: {headers: [{level, title, page}]}, tables: []}``
(/root/reference/02_src/vlm_ocr_doc_reader/schemas/document.py:41-52, CLI
command at cli.py:242,362; text assembled by joining batch texts with
'\\n\\n' at core/reader.py:190-207).  The span-sequence output subsumes it,
but this plan produces the same-shaped artifact as one table so a reference
user keeps their front door:

  (doc_id, text, headers array<struct<level int, title string, page int>>,
   tables array<string>)            -- tables always empty (README_EN.md:88)

``document_structure`` is the flat headers view (D6 parity: HeaderInfo.level
recovered deterministically via spec.heading_level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.classify import heading_level_col, heading_title_col
from .extract import classified_spans, extract_flat


def document_structure(documents: DataFrame,
                       classified: DataFrame | None = None) -> DataFrame:
    """D6 headers table: (doc_id, level, title, page_num) for kept heading
    spans.  page_num is 1-based = offset + 1 (renderer.py:89-90 convention).

    Pure Catalyst (one narrow projection over the classified span table) —
    no shuffle at all.  ``classified``: a precomputed ``classified_spans``
    frame to branch from (skips the classify scan here).  Both paths go
    through ``classified_spans``' null-guard (a span with a null offset or
    kind is invalid input everywhere else in the engine — P5 quarantine),
    so the default and precomputed paths return identical rows.
    """
    base = classified if classified is not None \
        else classified_spans(documents)
    kept = base.filter(F.col("keep") & (F.col("kind") == "heading"))
    return kept.select(
        "doc_id",
        heading_level_col(F.col("cleaned")).alias("level"),
        heading_title_col(F.col("cleaned")).alias("title"),
        (F.col("offset") + 1).cast("int").alias("page_num"))


def full_description(documents: DataFrame) -> DataFrame:
    """One row per doc: (doc_id, text, headers, tables) — the DocumentData
    analog.  Text is the '\\n\\n' join of kept text spans in reading order
    (XY-cut for layout docs via extract_flat); headers carry recovered
    levels; tables is the reference's always-empty list.

    Scale shape: ONE classify scan (the persisted ``classified_spans``
    frame feeds both the text and header branches — r3 classified twice) +
    extract_flat's plan + two hash aggregations on doc_id
    (sort_array(collect_list) keeps concat/header order deterministic, A4)
    + one join on doc_id to stitch text and headers.
    """
    from pyspark import StorageLevel
    parsed = classified_spans(documents).persist(StorageLevel.MEMORY_AND_DISK)
    text_df = (extract_flat(documents, classified=parsed)
               .filter(F.col("kind") == "text")
               .groupBy("doc_id")
               .agg(F.array_join(
                   F.transform(
                       F.sort_array(F.collect_list(
                           F.struct(F.col("order").alias("o"),
                                    F.col("text").alias("t")))),
                       lambda s: s.t), "\n\n").alias("text")))
    hdr_df = (document_structure(documents, classified=parsed)
              .groupBy("doc_id")
              .agg(F.transform(
                  F.sort_array(F.collect_list(
                      F.struct(F.col("page_num").alias("o"),
                               F.struct(F.col("level"), F.col("title"),
                                        F.col("page_num").alias("page"))
                               .alias("h")))),
                  lambda s: s.h).alias("headers")))
    empty_headers = F.array().cast(
        "array<struct<level:int,title:string,page:int>>")
    out = (documents.select("doc_id")
           .join(text_df, "doc_id", "left")
           .join(hdr_df, "doc_id", "left")
           .select("doc_id",
                   F.coalesce(F.col("text"), F.lit("")).alias("text"),
                   F.coalesce(F.col("headers"), empty_headers)
                    .alias("headers"),
                   F.array().cast("array<string>").alias("tables")))
    # the classified frame is persisted for the two branches above; hand
    # its handle to the caller (datapipe.cache.release_cached(result))
    from ..datapipe.cache import attach_cached_deps
    return attach_cached_deps(out, parsed)
