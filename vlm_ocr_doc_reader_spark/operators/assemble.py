"""Per-document span assembly with mega-doc salting (SURVEY §4.3).

``collect_list`` order is not guaranteed, so assembly always goes through
``sort_array(collect_list(struct(order, ...)))``.  Documents whose span count
exceeds ``spec.MEGA_DOC_SPAN_THRESHOLD`` are assembled in two phases over a
salted key — salt = contiguous order-range bucket, so phase 2 concatenates
pre-sorted chunks by bucket id.  This mirrors the reference's
page-then-chunk decomposition (core/reader.py:298-308): never ship a whole
mega-document as one aggregation value.  AQE cannot split a single group, so
the salt is explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..extraction import spec

OUT_SPAN_TYPE = ("array<struct<kind:string,text:string,"
                 "media_ref:string,order:int>>")


def assemble_spans(ordered: DataFrame,
                   mega_threshold: int = spec.MEGA_DOC_SPAN_THRESHOLD,
                   salt_buckets: int = spec.SALT_BUCKETS) -> DataFrame:
    """(doc_id, kind, text, media_ref, order) -> (doc_id, spans).

    Window(count) + both groupBys all partition by doc_id(+salt), so after
    the one exchange for the window the aggregations reuse the partitioning.
    """
    n = F.count("*").over(Window.partitionBy("doc_id"))
    chunk = F.greatest(
        F.lit(1),
        F.ceil(F.col("n_spans") / F.lit(salt_buckets)).cast("int"))
    salted = (ordered
              .withColumn("n_spans", n)
              .withColumn("salt",
                          F.when(F.col("n_spans") > mega_threshold,
                                 F.floor(F.col("order") / chunk))
                           .otherwise(F.lit(0)).cast("int")))

    span_struct = F.struct(
        F.col("order"), F.col("kind"), F.col("text"), F.col("media_ref"))
    parts = (salted.groupBy("doc_id", "salt")
             .agg(F.sort_array(F.collect_list(span_struct)).alias("part"),
                  F.min("order").alias("part_min")))
    docs = (parts.groupBy("doc_id")
            .agg(F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("part_min", "part"))),
                    lambda x: x["part"])).alias("raw_spans")))
    return docs.withColumn(
        "spans",
        F.transform(F.col("raw_spans"),
                    lambda s: F.struct(s["kind"].alias("kind"),
                                       s["text"].alias("text"),
                                       s["media_ref"].alias("media_ref"),
                                       s["order"].alias("order")))
    ).select("doc_id", "spans")


def with_empty_docs(assembled: DataFrame, all_doc_ids: DataFrame) -> DataFrame:
    """Docs whose spans were all boilerplate still appear, with []."""
    return (all_doc_ids.select("doc_id").distinct()
            .join(assembled, "doc_id", "left")
            .withColumn("spans", F.coalesce(F.col("spans"),
                                            F.array().cast(OUT_SPAN_TYPE)))
            .select("doc_id", "spans"))
