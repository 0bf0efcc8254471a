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


def test_keyword_snippets_windows_and_cap(spark):
    from vlm_ocr_doc_reader_spark.datapipe.search import keyword_snippets
    df = spark.createDataFrame(
        [(1, "a b c TARGET d e f"),
         (2, "TARGET x y z TARGET q r s TARGET t u TARGET v")],
        "doc_id long, text string")
    out = keyword_snippets(df, "target", window=2, max_per_doc=3)
    rows = sorted((r["id"], r["hit_pos"], r["snippet"])
                  for r in out.collect())
    # doc 1: one hit at token index 3, window clipped to bounds
    assert rows[0] == (1, 3, "b c target d e")
    # doc 2: four occurrences, capped to the first 3, in token order
    d2 = [r for r in rows if r[0] == 2]
    assert len(d2) == 3
    assert d2[0][1] == 0 and d2[0][2].startswith("target x y")
    # no-hit docs emit nothing
    assert keyword_snippets(
        spark.createDataFrame([(3, "nothing here")],
                              "doc_id long, text string"),
        "target").count() == 0
