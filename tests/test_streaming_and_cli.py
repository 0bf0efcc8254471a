"""Structured-Streaming incremental mode + CLI arg parsing."""

import pytest

from vlm_ocr_doc_reader_spark.cli import parse_axes_arg, parse_pages_arg
from vlm_ocr_doc_reader_spark.fixtures.generate import (
    generate_documents, write_documents_parquet)
from vlm_ocr_doc_reader_spark.plans.extract import extract
from vlm_ocr_doc_reader_spark.streaming.incremental import run_incremental


def test_parse_pages_arg():
    assert parse_pages_arg("1,2,5-7") == [1, 2, 5, 6, 7]
    assert parse_pages_arg("3") == [3]
    assert parse_pages_arg("2-2,1") == [1, 2]
    with pytest.raises(ValueError):
        parse_pages_arg("7-5")
    with pytest.raises(ValueError):
        parse_pages_arg("0")


def test_parse_axes_arg():
    assert parse_axes_arg("1,3,5") == (1, 3, 5)
    with pytest.raises(ValueError):
        parse_axes_arg("0,1")


def test_incremental_stream_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    docs_a = generate_documents(25, seed=3, mega_spans=200,
                                include_edge=False)
    docs_b = generate_documents(40, seed=3, mega_spans=200,
                                include_edge=False)[25:]
    import os
    os.makedirs(in_dir)
    write_documents_parquet(docs_a, f"{in_dir}/part_a.parquet")

    run_incremental(spark, in_dir, out_dir, state, ckpt)
    got1 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert len(got1) == 25

    # second file lands; availableNow picks up ONLY the new file
    write_documents_parquet(docs_b, f"{in_dir}/part_b.parquet")
    run_incremental(spark, in_dir, out_dir, state, ckpt)

    streamed = {r["doc_id"]: r["spans"]
                for r in spark.read.parquet(out_dir).collect()}
    assert len(streamed) == 40

    batch = {r["doc_id"]: r["spans"]
             for r in extract(spark.read.parquet(in_dir)).collect()}
    assert streamed == batch
