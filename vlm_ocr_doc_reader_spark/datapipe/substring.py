"""Substring-granularity duplicate excision (beyond the reference).

Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better") showed that corpus-scale *substring* duplication — boilerplate
sentences, license blocks, templated paragraphs embedded inside otherwise
unique documents — must be excised at character granularity, not document
or passage granularity (the engine's ``dedup.py`` covers those).  The
scalable detector here is MOSS winnowing (Schleimer, Wilkerson, Aiken,
SIGMOD 2003): hash every k-gram, slide a w-wide window over the hash
sequence, keep each window's minimum — a content-defined selection with
the guarantee that any common substring of length >= w + k - 1 shares at
least one selected fingerprint between its copies, while storing only
~2/(w+1) of all k-grams.

Dataflow (all Catalyst, no UDF):

1. ``winnow_fingerprints`` — per-char explode (narrow; CPU ~ corpus
   bytes, which is inherent to substring dedup), k-gram hash =
   60-bit md5 prefix (portable to the DuckDB twin), window min via ONE
   per-doc window, distinct.
2. ``dup_regions`` — fingerprints repeated corpus-wide (minus the one
   canonical first occurrence: min (doc_id, pos) per hash survives, Lee
   et al.'s keep-one policy) mark ``[pos, pos+k)`` spans; per-doc
   gaps-and-islands merges spans closer than ``merge_gap`` into regions.
3. ``excise_dup_substrings`` — rebuild each document from the segments
   BETWEEN its regions (lag window + ordered string_agg) and report
   duplicated char counts.

Shuffles: the per-doc winnow window (hash on doc id), one hash aggregate
on fingerprint hash (cardinality ~ selected fingerprints, ~bytes/w), and
the per-doc region/excision windows — every one keyed and map-combinable,
nothing quadratic, no crossJoin.  Skew: a mega-document's explode is
span-local CPU, not a shuffle hot key; the fingerprint-hash aggregate
distributes by content.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _fkey(hash_hex: Column, pos: Column) -> Column:
    """Portable total order for winnow selection: 15-hex-digit k-gram
    hash then zero-padded position — lexicographic min == (hash, pos)
    min, identical in Spark and DuckDB (no struct-comparison or 64-bit
    signedness differences)."""
    return F.concat(hash_hex, F.lit("#"),
                    F.lpad(pos.cast("string"), 9, "0"))


def winnow_fingerprints(df: DataFrame, k: int = 12, w: int = 24,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Winnowed k-gram fingerprints per document.

    Output: ``(doc_id, pos, fp)`` — ``fp`` is the 15-hex-char md5 prefix
    of the k-gram starting at 0-based char offset ``pos``; one row per
    distinct selected (window-min) fingerprint occurrence.  Documents
    shorter than ``k`` chars emit nothing.

    Guarantee (winnowing theorem): two documents sharing a substring of
    length >= ``w + k - 1`` share at least one (fp) value; total selected
    per doc ~ ``2 * n_chars / (w + 1)``.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    src = (df.select(F.col(id_col).alias("doc_id"), t.alias("_t"))
           .filter(F.length("_t") >= k))
    grams = (src.select("doc_id",
                        F.posexplode(F.sequence(
                            F.lit(0), F.length("_t") - k))
                        .alias("_i", "pos"),
                        F.col("_t"))
             .select("doc_id", "pos",
                     F.substring(F.col("_t"), F.col("pos") + 1, k)
                     .alias("gram")))
    hashed = grams.select(
        "doc_id", "pos",
        F.substring(F.md5(F.col("gram")), 1, 15).alias("fp"))
    key = _fkey(F.col("fp"), F.col("pos"))
    win = (Window.partitionBy("doc_id").orderBy("pos")
           .rowsBetween(0, w - 1))
    sel = (hashed.withColumn("_sel", F.min(key).over(win))
           .select("doc_id", F.split(F.col("_sel"), "#")[0].alias("fp"),
                   F.split(F.col("_sel"), "#")[1].cast("int").alias("pos"))
           .dropDuplicates(["doc_id", "fp", "pos"]))
    return sel.select("doc_id", "pos", "fp")


def dup_regions(df: DataFrame, k: int = 12, w: int = 24,
                merge_gap: int | None = None, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Duplicated character regions per document: fingerprint occurrences
    whose hash recurs corpus-wide — EXCLUDING the canonical first
    occurrence (min ``(doc_id, pos)`` per hash keeps one copy of every
    passage in the corpus) — expanded to ``[pos, pos + k)`` and merged
    when closer than ``merge_gap`` chars (default ``w``, the winnow
    sampling distance: fingerprints of one contiguous duplicate are at
    most ~w apart).

    Output: ``(doc_id, start, end)`` with ``end`` exclusive, regions
    disjoint and sorted per doc.
    """
    gap = w if merge_gap is None else merge_gap
    fps = winnow_fingerprints(df, k=k, w=w, id_col=id_col,
                              text_col=text_col)
    per_hash = (fps.groupBy("fp")
                .agg(F.count(F.lit(1)).alias("n_occ"),
                     F.min(F.struct("doc_id", "pos")).alias("first_occ")))
    marked = (fps.join(per_hash.filter(F.col("n_occ") >= 2), "fp")
              .filter(~((F.col("doc_id") == F.col("first_occ.doc_id"))
                        & (F.col("pos") == F.col("first_occ.pos"))))
              .select("doc_id", F.col("pos").alias("start"),
                      (F.col("pos") + k).alias("end")))
    w_doc = Window.partitionBy("doc_id").orderBy("start")
    prev_max_end = F.max("end").over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1))
    islands = (marked
               .withColumn("_new", F.when(
                   prev_max_end.isNull()
                   | (F.col("start") > prev_max_end + gap), 1).otherwise(0))
               .withColumn("_isl", F.sum("_new").over(
                   w_doc.rowsBetween(Window.unboundedPreceding, 0))))
    return (islands.groupBy("doc_id", "_isl")
            .agg(F.min("start").cast("int").alias("start"),
                 F.max("end").cast("int").alias("end"))
            .select("doc_id", "start", "end"))


def excise_dup_substrings(df: DataFrame, k: int = 12, w: int = 24,
                          merge_gap: int | None = None,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Lee-et-al-style substring dedup: every corpus-repeated region
    (except its canonical first occurrence) is cut out of the text.

    Output: all input columns + ``clean_text``, ``dup_chars`` (chars
    removed), ``n_dup_regions``.  Docs without duplicated regions pass
    through with ``clean_text = text``.

    The rebuild is relational: each region row becomes a kept segment
    ``[prev_region_end, region_start)`` via a lag window, plus the tail
    segment after the last region, reassembled with an ordered
    ``string_agg`` — no per-row Python, no driver collect.
    """
    regions = dup_regions(df, k=k, w=w, merge_gap=merge_gap,
                          id_col=id_col, text_col=text_col)
    w_doc = Window.partitionBy("doc_id").orderBy("start")
    seg_start = F.coalesce(F.lag("end").over(w_doc), F.lit(0))
    segs = (regions
            .withColumn("seg_start", seg_start)
            .withColumn("seg_end", F.col("start")))
    stats = (regions.groupBy("doc_id")
             .agg(F.sum(F.col("end") - F.col("start")).cast("bigint")
                  .alias("dup_chars"),
                  F.count(F.lit(1)).cast("bigint").alias("n_dup_regions"),
                  F.max("end").cast("int").alias("_last_end")))
    base = df.withColumn("doc_id", F.col(id_col)) if id_col != "doc_id" \
        else df
    joined = base.join(stats, "doc_id", "left")
    body = (segs.join(base.select("doc_id",
                                  F.col(text_col).alias("_t")), "doc_id")
            .groupBy("doc_id")
            .agg(F.concat_ws("", F.array_sort(F.collect_list(F.struct(
                F.col("seg_start"),
                F.substring(F.col("_t"), F.col("seg_start") + 1,
                            F.greatest(F.col("seg_end")
                                       - F.col("seg_start"),
                                       F.lit(0))).alias("piece"))))
                .getField("piece")).alias("_head"))
            )
    out = (joined.join(body, "doc_id", "left")
           .withColumn(
               "clean_text",
               F.when(F.col("dup_chars").isNull(), F.col(text_col))
               .otherwise(F.concat(
                   F.coalesce(F.col("_head"), F.lit("")),
                   F.substring(F.col(text_col), F.col("_last_end") + 1,
                               F.greatest(
                                   F.length(F.col(text_col))
                                   - F.col("_last_end"), F.lit(0))))))
           .withColumn("dup_chars",
                       F.coalesce(F.col("dup_chars"),
                                  F.lit(0).cast("bigint")))
           .withColumn("n_dup_regions",
                       F.coalesce(F.col("n_dup_regions"),
                                  F.lit(0).cast("bigint")))
           .drop("_head", "_last_end"))
    return out
