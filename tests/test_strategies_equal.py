"""Fused (one grouped Arrow stage) and declarative (joins+windows) extraction
strategies must produce byte-identical output — they share the spec but not
the physical plan, so this is the drift guard."""

import pytest

from vlm_ocr_doc_reader_spark.fixtures.generate import (
    generate_documents, write_documents_parquet)
from vlm_ocr_doc_reader_spark.plans.extract import extract


@pytest.fixture(scope="module")
def corpus_df(spark, tmp_path_factory):
    docs = generate_documents(120, seed=99, mega_spans=1500)
    p = str(tmp_path_factory.mktemp("se") / "docs.parquet")
    write_documents_parquet(docs, p)
    return spark.read.parquet(p)


def test_fused_equals_declarative(corpus_df):
    a = {r["doc_id"]: r["spans"]
         for r in extract(corpus_df, strategy="fused").collect()}
    b = {r["doc_id"]: r["spans"]
         for r in extract(corpus_df, strategy="declarative").collect()}
    assert set(a) == set(b)
    diff = [d for d in a if a[d] != b[d]]
    assert not diff, f"{len(diff)} docs differ; first: {diff[0]}"
