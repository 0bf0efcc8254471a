"""Streaming (in-flight) corpus curation.

`datapipe/curate.py` curates the corpus at rest; THIS module runs the
narrow part of the same policy chain on the ingest firehose, so junk never
lands:

    quality floor  ->  language allowlist  ->  first-arrival content dedup

The quality and language stages are per-row Catalyst expressions (the same
`quality_features` / `lang_id` operators the batch pipeline gates through
its oracles), so they are stream-safe with no state; the dedup stage is
the watermark-bounded native `dropDuplicatesWithinWatermark` from
`streaming/dedup.py` — state bounded by (arrival rate x watermark), the
property that keeps the stream runnable forever at 100 TB/day.

What is deliberately NOT here: near-dup (MinHash/Jaccard) and the
train/val/test split.  Near-dup needs pair joins across the whole corpus —
that stays a periodic batch pass over the landed output (the same
batch-backstop split as dedup_stream documents); splits are assigned at
training-set build time so re-ingestion cannot move documents between
splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datapipe.textstats import lang_id, quality_features
from .dedup import dedup_stream

DOCS_TEXT_SCHEMA = "doc_id bigint, text string"


def curate_stream(stream: DataFrame,
                  min_quality: float = 0.55,
                  langs: tuple[str, ...] = ("en",),
                  text_col: str = "text",
                  watermark: str = "10 minutes",
                  ts_col: str | None = None) -> DataFrame:
    """Transform a document stream into its curated survivor stream:
    (input columns..., quality_score, pred_lang), one row per FIRST arrival
    of each surviving normalized-content digest.

    ``ts_col``: event-time column for the dedup watermark; None stamps the
    processing-time arrival (`current_timestamp`), which is the right
    default for a landing feed with no upstream event time."""
    scored = quality_features(stream, text_col=text_col) \
        .filter(F.col("quality_score") >= min_quality)
    tagged = lang_id(scored, text_col=text_col) \
        .filter(F.col("pred_lang").isin(*langs))
    # content identity = the SAME normalized-text digest batch exact-dedup
    # groups on (datapipe/curate.py), so "duplicate" agrees in flight and
    # at rest
    from ..datapipe.dedup import _norm
    keyed = tagged.withColumn("_digest", F.md5(_norm(F.col(text_col))))
    if ts_col is None:
        ts_col = "_arrival_ts"
        keyed = keyed.withColumn(ts_col, F.current_timestamp())
    deduped = dedup_stream(keyed, ("_digest",), ts_col=ts_col,
                           watermark=watermark)
    return deduped.drop("_digest", "_arrival_ts")


def run_curation_stream(spark: SparkSession, input_dir: str, output_dir: str,
                        checkpoint_dir: str,
                        schema: str = DOCS_TEXT_SCHEMA,
                        min_quality: float = 0.55,
                        langs: tuple[str, ...] = ("en",),
                        watermark: str = "10 minutes"):
    """File-source incremental run (Trigger.AvailableNow): land exactly the
    curated first arrivals into ``output_dir``.  Spark's checkpoint tracks
    consumed files, the dedup state store tracks seen digests — a re-run
    picks up only new files and never re-lands a seen document."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    q = (curate_stream(stream, min_quality=min_quality, langs=langs,
                       watermark=watermark)
         .writeStream
         .format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
