"""RAKE phrase extraction vs its DuckDB twin.

Fixture exercises the operator's decision points: stopword boundaries,
non-alpha boundary tokens (digits, punctuation-bearing tokens), a
phrase repeated inside one document (must be scored once, not ranked
twice), the max-phrase-len guard, an all-stopword doc and an empty doc
(no candidate rows at all).
"""

import random

import duckdb
import pandas as pd
import pytest

from vlm_ocr_doc_reader_spark.datapipe.terms import rake_phrases
from vlm_ocr_doc_reader_spark.datapipe.textstats import STOPWORDS

SEED = 20260818
CONTENT = ["linear", "regression", "model", "deep", "neural", "network",
           "gradient", "descent", "feature", "vector", "spark", "engine"]


def _docs():
    rng = random.Random(SEED)
    rows = []
    for i in range(120):
        toks = []
        for _ in range(rng.randrange(4, 25)):
            r = rng.random()
            if r < 0.35:
                toks.append(rng.choice(STOPWORDS))
            elif r < 0.45:
                toks.append(rng.choice(["42", "x9!", "3.14", "--"]))
            else:
                toks.append(rng.choice(CONTENT))
        rows.append((i, " ".join(toks)))
    # repeated phrase inside one doc: "deep neural network" twice
    rows.append((200, "deep neural network of the deep neural network"))
    rows.append((201, "the of and to in"))          # all stopwords
    rows.append((202, ""))                          # empty
    rows.append((203, "a b c d e f"))               # one over-long run
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("documents", _docs())
    return con


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_docs(), "doc_id long, text string")


RAKE_SQL = """
WITH base AS (
  SELECT doc_id AS id,
         list_filter(string_split(lower(regexp_replace(trim(text),
                     '\\s+', ' ', 'g')), ' '), x -> x <> '') AS ws
  FROM documents),
toks0 AS (
  SELECT id, unnest(list_transform(generate_series(1, len(ws)),
             i -> struct_pack(p := i, t := ws[i]))) AS u
  FROM base),
toks AS (
  SELECT id, u.p AS pos, u.t AS token,
         (u.t IN ({stops}) OR NOT regexp_matches(u.t, '^[a-z]+$'))
           AS is_b
  FROM toks0),
runs AS (
  SELECT id, pos, token,
         sum(CASE WHEN is_b THEN 1 ELSE 0 END)
           OVER (PARTITION BY id ORDER BY pos) AS island
  FROM toks QUALIFY NOT is_b),
phrases AS (
  SELECT id, island, string_agg(token, ' ' ORDER BY pos) AS phrase,
         count(*) AS n_words
  FROM runs GROUP BY id, island
  HAVING count(*) <= {maxlen}),
members AS (
  SELECT r.id, r.island, r.token, p.n_words
  FROM runs r JOIN phrases p USING (id, island)),
wstats AS (
  SELECT id, token, count(*) AS freq, sum(n_words) AS deg,
         round(CAST(sum(n_words) AS DOUBLE) / count(*), 12) AS ratio
  FROM members GROUP BY id, token),
scored0 AS (
  SELECT m.id, m.island,
         round(CAST(sum(CAST(w.ratio AS DECIMAL(24,12))) AS DOUBLE), 6)
           AS score
  FROM members m JOIN wstats w USING (id, token)
  GROUP BY m.id, m.island),
scored AS (
  SELECT s.id, p.phrase, max(p.n_words) AS nw, max(s.score) AS score
  FROM scored0 s JOIN phrases p USING (id, island)
  GROUP BY s.id, p.phrase),
ranked AS (
  SELECT id, phrase, CAST(nw AS INTEGER) AS n_words, score,
         CAST(row_number() OVER (PARTITION BY id
              ORDER BY score DESC, phrase ASC) AS INTEGER) AS rank
  FROM scored)
SELECT * FROM ranked WHERE rank <= {k} ORDER BY id, rank
"""


def _sql(k=3, maxlen=4):
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return RAKE_SQL.format(stops=stops, maxlen=maxlen, k=k)


def _match(spark_df, duck_df, float_cols=()):
    got = spark_df.toPandas().reset_index(drop=True)
    want = duck_df.reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c], want[c]
        if c in float_cols:
            g = g.astype(float).round(6)
            w = w.astype(float).round(6)
            assert (g == w).all(), f"col {c} differs"
        else:
            assert str(g.dtype) == str(w.dtype), \
                f"col {c}: dtype {g.dtype} != {w.dtype}"
            assert g.equals(w), f"col {c} differs"


def test_rake_matches_duckdb(docs, duck):
    got = rake_phrases(docs, k=3, max_phrase_len=4).orderBy("id", "rank")
    _match(got, duck.execute(_sql()).fetchdf(), float_cols=("score",))


def test_rake_edge_docs(docs):
    out = rake_phrases(docs, k=3, max_phrase_len=4).toPandas()
    ids = set(out.id)
    assert 201 not in ids            # all stopwords: no candidates
    assert 202 not in ids            # empty text
    assert 203 not in ids            # single 6-token run > max_phrase_len
    # the repeated phrase is scored once and ranks first in its doc
    d = out[out.id == 200].sort_values("rank")
    assert list(d.phrase) == ["deep neural network"]
    assert list(d.n_words) == [3]
    # each member word has freq 2, deg 6 -> ratio 3 -> score 9
    assert list(d.score) == [9.0]


def test_rake_longer_phrases_outrank_singletons(docs):
    out = rake_phrases(docs, k=1, max_phrase_len=4).toPandas()
    multi = out[out.n_words > 1]
    # whenever a doc's top phrase is multi-word its score must exceed
    # the 1.0 floor a pure singleton run would get
    assert (multi.score > 1.0).all()
