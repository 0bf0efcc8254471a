"""Streaming in-flight curation (streaming/curate.py): quality floor +
language allowlist + first-arrival content dedup over a file source, with
checkpointed incremental restarts."""

import os

GOOD_EN = ("the data and the model of the pipeline runs well and the "
           "results are good and the work continues for the team today.")
GOOD_EN_2 = ("the unique and different of content about spark engines "
             "and the rows and the tables and the shuffles everywhere.")
GOOD_DE = "der Tisch und die Daten der der und und die die der und."


def _write(spark, in_dir, rows):
    # append flat part-files into the stream's source dir (the file source
    # does not recurse into nested run directories)
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .coalesce(1).write.mode("append").parquet(in_dir)


def test_curation_stream_filters_and_dedups_across_batches(spark, tmp_path):
    from vlm_ocr_doc_reader_spark.streaming.curate import run_curation_stream
    in_dir, out, ckpt = (str(tmp_path / p) for p in ("in", "out", "ckpt"))

    # batch 1: survivor, junk (quality floor), German (lang allowlist),
    # and an in-batch exact repeat of the survivor
    _write(spark, in_dir,
           [(1, GOOD_EN), (2, "!!!"), (3, GOOD_DE), (4, GOOD_EN)])
    run_curation_stream(spark, in_dir, out, ckpt, min_quality=0.3,
                        langs=("en",))
    rows1 = spark.read.parquet(out).collect()
    assert sorted(r["text"] for r in rows1) == [GOOD_EN]
    assert all("quality_score" in r.asDict() and "pred_lang" in r.asDict()
               for r in rows1)

    # batch 2 (restart from checkpoint): a cross-batch repeat (different
    # doc_id, same normalized content — extra whitespace) drops; a fresh
    # doc lands; batch-1 rows are not re-emitted
    _write(spark, in_dir,
           [(5, "  " + GOOD_EN.replace(" ", "  ")), (6, GOOD_EN_2)])
    run_curation_stream(spark, in_dir, out, ckpt, min_quality=0.3,
                        langs=("en",))
    rows = spark.read.parquet(out).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 6] or \
        sorted(r["doc_id"] for r in rows) == [4, 6]  # in-batch pick is
    # processing order (Spark's dropDuplicates contract); cross-batch the
    # first-landed batch always wins


def test_curate_stream_transform_is_streaming_safe(spark, tmp_path):
    """curate_stream must build on an actual streaming DataFrame (no
    batch-only ops) — constructing the plan on readStream is the check."""
    from vlm_ocr_doc_reader_spark.streaming.curate import (DOCS_TEXT_SCHEMA,
                                                           curate_stream)
    in_dir = str(tmp_path / "in")
    _write(spark, in_dir, [(1, GOOD_EN)])
    stream = spark.readStream.schema(DOCS_TEXT_SCHEMA).parquet(in_dir)
    out = curate_stream(stream)
    assert out.isStreaming
    assert "quality_score" in out.columns and "pred_lang" in out.columns
    assert "_digest" not in out.columns and "_arrival_ts" not in out.columns
