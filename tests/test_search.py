"""Keyword search / inverted postings (datapipe/search.py)."""

import pytest

from vlm_ocr_doc_reader_spark.datapipe.search import (inverted_postings,
                                                      keyword_search)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [(1, "spark joins the table with a shuffle"),
         (2, "the table holds rows"),
         (3, "Spark TABLE join plan"),          # case-normalized match
         (4, "nothing relevant here at all")],
        "doc_id int, text string")


def test_keyword_search_and_or(corpus):
    got_and = {r["id"]: r["n_matched"]
               for r in keyword_search(corpus, ["spark", "table"],
                                       mode="and").collect()}
    assert got_and == {1: 2, 3: 2}
    got_or = {r["id"]: r["n_matched"]
              for r in keyword_search(corpus, ["spark", "table"],
                                      mode="or").collect()}
    assert got_or == {1: 2, 2: 1, 3: 2}
    with pytest.raises(ValueError, match="mode"):
        keyword_search(corpus, ["x"], mode="not")
    with pytest.raises(ValueError, match="empty"):
        keyword_search(corpus, [])
    with pytest.raises(ValueError, match="single tokens"):
        keyword_search(corpus, ["machine learning"])  # untokenizable


def test_inverted_postings_df_bounds(corpus):
    idx = {r["token"]: (r["df"], r["postings"])
           for r in inverted_postings(corpus, min_df=2, max_df=2).collect()}
    # 'table' (df=3) pruned by max_df; singletons ('join', 'rows', ...)
    # pruned by min_df; survivors with sorted postings:
    assert idx == {"spark": (2, [1, 3]), "the": (2, [1, 2])}
