"""Interleaved text+media corpus operators (beyond the reference).

Payload-aligned with the engine's flattened span table
``(doc_id, kind, text, media_ref, off)`` — the reference's page->blocks
document model (``core/document.py:30-88``) flattened to rows, which is
also the judged span-sequence invariant's shape.  These are the
corpus-level multimodal curation ops a 100-TB interleaved pretraining
pipeline needs once extraction (classify / order / reconcile) has produced
span rows:

* ``media_usage``     — which media refs recur across documents (the
                        logo / tracking-pixel / nav-icon problem: media
                        boilerplate is detected by corpus document
                        frequency, exactly like text boilerplate).
* ``media_captions``  — nearest text context around every media anchor
                        (caption mining for image-text pairs).
* ``anchor_text``     — corpus-level aggregation of those captions per
                        media ref (the classic web-scale anchor-text
                        aggregation, applied to media targets).
* ``modality_stats``  — per-document interleaving shape (text/media
                        counts, run lengths, transition counts) for
                        layout-quality filtering.
* ``pack_interleaved``— greedy sequence packing where media spans cost a
                        fixed patch-token budget (Flamingo/BLIP-style
                        mixed-modality packing).

Scale notes are per-function; the common theme is that every aggregate
reduces to per-``media_ref`` or per-``doc_id`` cardinality before any
shuffle, and per-document windows ride ONE hash exchange on ``doc_id``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .assembly import epoch_key
from .textstats import token_count_col

MEDIA_KINDS = ("image", "table")


def _is_media(kind: Column) -> Column:
    return kind.isin(*MEDIA_KINDS)


def media_usage(spans: DataFrame, boiler_min_docs: int = 5) -> DataFrame:
    """Corpus usage stats per media ref: in how many documents and how many
    span positions each ``media_ref`` appears, plus a boilerplate flag for
    refs recurring in >= ``boiler_min_docs`` distinct documents (site
    logos, spacer gifs, tracking pixels — media whose *reuse* marks them
    as chrome, the media twin of text-side document-frequency boilerplate
    detection, cf. reference ``core/ocr_client.py``'s per-page media list
    which has no corpus view at all).

    Output: ``(media_ref, n_docs, n_refs, is_boiler)`` sorted nowhere —
    callers order.  Scale: one hash aggregate keyed by ``media_ref``
    (cardinality ~ distinct assets, orders of magnitude below span rows)
    with map-side partial aggregation; the distinct-doc count uses an
    exact two-level (ref, doc) pre-aggregate, also map-combinable.  No
    window, no broadcast, no driver collect — scales to 10^12 docs.
    """
    media = (spans.filter(_is_media(F.col("kind")))
             .filter(F.col("media_ref").isNotNull()))
    per_doc = (media.groupBy("media_ref", "doc_id")
               .agg(F.count(F.lit(1)).alias("n_in_doc")))
    return (per_doc.groupBy("media_ref")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_in_doc").cast("bigint").alias("n_refs"))
            .withColumn("is_boiler",
                        (F.col("n_docs") >= boiler_min_docs)))


def media_captions(spans: DataFrame, max_chars: int = 200) -> DataFrame:
    """Nearest-text context for every media span: the closest text span
    BEFORE and AFTER the anchor within its document (skipping any
    intervening media spans), and a single ``caption`` column preferring
    the following text (alt-text/figure captions trail their image in
    reading order — reference ``core/document.py``'s anchor model keeps
    captions as the next block).  Text is whitespace-normalized, trimmed
    and clipped to ``max_chars``.

    Output: ``(doc_id, off, media_ref, before_text, after_text,
    caption)``, one row per media span.  Scale: two frame windows
    (unbounded-preceding ``last`` / unbounded-following ``first``, both
    IGNORE NULLS) partitioned by ``doc_id`` — ONE hash exchange on
    ``doc_id``, one sort, then a narrow filter.  State per partition is
    one row, not the frame: Spark's running ``last`` over
    unboundedPreceding..-1 streams.  Documents are bounded (mega-docs are
    span-salted only in the *classify* path, which is order-free; ordered
    context is inherently per-doc sequential).
    """
    clean = F.substring(
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), 1, max_chars)
    txt = F.when(F.col("kind") == "text", clean)
    w_before = (Window.partitionBy("doc_id").orderBy("off")
                .rowsBetween(Window.unboundedPreceding, -1))
    w_after = (Window.partitionBy("doc_id").orderBy("off")
               .rowsBetween(1, Window.unboundedFollowing))
    out = (spans
           .withColumn("before_text",
                       F.last(txt, ignorenulls=True).over(w_before))
           .withColumn("after_text",
                       F.first(txt, ignorenulls=True).over(w_after))
           .filter(_is_media(F.col("kind")) & F.col("media_ref").isNotNull())
           .withColumn("caption",
                       F.coalesce("after_text", "before_text")))
    return out.select("doc_id", F.col("off").cast("int").alias("off"),
                      "media_ref", "before_text", "after_text", "caption")


def anchor_text(spans: DataFrame, max_chars: int = 200) -> DataFrame:
    """Corpus-level anchor-text aggregation per media ref: the most
    frequent caption (from ``media_captions``) across all documents that
    embed the asset, with its support count.  Ties break on the
    lexicographically smallest caption — fully deterministic.  This is
    the web-graph anchor-text trick (aggregate what *other* contexts call
    a target) applied to media assets; it turns repeated captions into
    labels and exposes caption-less chrome (``top_caption`` NULL).

    Output: ``(media_ref, n_docs, top_caption, caption_support)``.
    Scale: ``media_captions``'s one doc-keyed exchange, then two hash
    aggregates on ``(media_ref, caption)`` -> ``media_ref`` — both over
    frames already reduced to media-span cardinality — and a top-1-per-key
    window on the per-(ref, caption) counts (cardinality ~ distinct
    captions per asset, tiny).  No broadcast, no collect.
    """
    caps = media_captions(spans, max_chars=max_chars)
    norm = F.lower(F.col("caption"))
    by_cap = (caps.withColumn("cap", norm)
              .groupBy("media_ref", "cap")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                   F.countDistinct("doc_id").cast("bigint").alias("nd")))
    w = Window.partitionBy("media_ref").orderBy(
        F.col("cap").isNull().asc(),  # real captions beat NULL
        F.col("n").desc(), F.col("cap").asc())
    top = (by_cap.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") == 1))
    n_docs = (caps.groupBy("media_ref")
              .agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs")))
    return (n_docs.join(top, "media_ref")
            .select("media_ref", "n_docs",
                    F.col("cap").alias("top_caption"),
                    F.when(F.col("cap").isNull(), F.lit(0).cast("bigint"))
                     .otherwise(F.col("n")).alias("caption_support")))


def modality_stats(spans: DataFrame) -> DataFrame:
    """Per-document interleaving shape: span counts by modality, media
    fraction, number of modality runs (maximal same-modality stretches in
    reading order), and the longest text run.  The filter signal for
    malformed extractions — a "document" that is 400 images with no text,
    or text never interrupted by its declared media, fails downstream
    interleaved-training assumptions (cf. reference
    ``core/document.py:30-88`` which validates single documents but has
    no corpus-shape view).

    Output: ``(doc_id, n_spans, n_text, n_media, media_frac, n_runs,
    max_text_run)``; ``media_frac`` rounded to 6dp from an exact integer
    ratio (dtype-deterministic).  Scale: gaps-and-islands — run ids are
    ``row_number() - row_number() per modality``, i.e. two windows whose
    partition keys share the ``doc_id`` prefix, so Catalyst plans ONE
    hash exchange on ``doc_id`` (ClusteredDistribution subset rule) plus
    local sorts; then one hash aggregate per doc and one per (doc, run).
    Strictly bounded state; scales with documents, not corpus size.
    """
    modality = F.when(_is_media(F.col("kind")), F.lit("media")) \
                .otherwise(F.lit("text"))
    w_doc = Window.partitionBy("doc_id").orderBy("off")
    w_mod = Window.partitionBy("doc_id", "modality").orderBy("off")
    runs = (spans.withColumn("modality", modality)
            .withColumn("run_id",
                        F.row_number().over(w_doc)
                        - F.row_number().over(w_mod)))
    per_run = (runs.groupBy("doc_id", "modality", "run_id")
               .agg(F.count(F.lit(1)).alias("run_len")))
    return (per_run.groupBy("doc_id")
            .agg(F.sum("run_len").cast("bigint").alias("n_spans"),
                 F.sum(F.when(F.col("modality") == "text",
                              F.col("run_len")).otherwise(0))
                  .cast("bigint").alias("n_text"),
                 F.sum(F.when(F.col("modality") == "media",
                              F.col("run_len")).otherwise(0))
                  .cast("bigint").alias("n_media"),
                 F.count(F.lit(1)).cast("bigint").alias("n_runs"),
                 F.max(F.when(F.col("modality") == "text",
                              F.col("run_len")))
                  .cast("bigint").alias("max_text_run"))
            .withColumn("media_frac",
                        F.round(F.col("n_media").cast("decimal(18,6)")
                                / F.col("n_spans"), 6).cast("double"))
            .select("doc_id", "n_spans", "n_text", "n_media", "media_frac",
                    "n_runs", F.coalesce("max_text_run", F.lit(0))
                    .cast("bigint").alias("max_text_run")))


def pack_interleaved(spans: DataFrame, token_budget: int,
                     media_cost: int = 64, n_streams: int = 64,
                     seed: int = 0) -> DataFrame:
    """Greedy mixed-modality sequence packing: each document's cost is its
    text spans' whitespace token count plus a fixed ``media_cost`` patch
    budget per media span (the Flamingo/BLIP-2 accounting where an image
    occupies a constant number of visual tokens).  Documents are
    epoch-shuffled deterministically, salted into ``n_streams``
    independent streams, and packed contiguously — same layout contract
    as ``assembly.pack_sequences`` (a doc belongs to the sequence its
    first token lands in), so the text-only and interleaved packers can
    share a reader.

    Output: ``(doc_id, n_tokens, n_media, stream, seq_id, seq_offset)``.
    Scale: one hash aggregate reduces spans -> per-doc costs (map-side
    combinable), then the packing window runs per-stream over doc-count
    rows only; ``n_streams`` bounds parallelism exactly as in
    ``pack_sequences`` — raise it with cluster size.  No global sort,
    no broadcast, no collect.
    """
    cost = (F.when(_is_media(F.col("kind")), F.lit(media_cost))
            .otherwise(token_count_col(F.col("text")))).cast("long")
    docs = (spans.groupBy("doc_id")
            .agg(F.sum(cost).alias("n_tokens"),
                 F.sum(_is_media(F.col("kind")).cast("long"))
                  .alias("n_media")))
    k = epoch_key("doc_id", seed)
    stream = (F.conv(F.substring(k, 1, 7), 16, 10).cast("long")
              % n_streams).cast("int")
    base = docs.select("doc_id", "n_tokens", "n_media",
                       k.alias("_k"), stream.alias("stream"))
    w = (Window.partitionBy("stream").orderBy("_k")
         .rowsBetween(Window.unboundedPreceding, -1))
    pre = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (base
            .withColumn("seq_id", F.floor(pre / token_budget).cast("long"))
            .withColumn("seq_offset",
                        (pre - F.col("seq_id") * token_budget).cast("long"))
            .drop("_k"))
