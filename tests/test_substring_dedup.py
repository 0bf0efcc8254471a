"""Tests for substring-granularity duplicate excision
(`datapipe/substring.py`) — staged for the r7 gate window.

Covers: DuckDB twin of the full winnow -> regions pipeline (dtype-strict
driver comparator discipline), the winnowing detection guarantee on
planted duplicates, keep-one-canonical-copy semantics, and excision
reconstruction invariants (clean_text is the original minus exactly the
reported regions).
"""

import random

import duckdb
import pandas as pd
import pytest

from vlm_ocr_doc_reader_spark.datapipe.substring import (
    dup_regions, excise_dup_substrings, winnow_fingerprints)

SEED = 20260820
K, W = 8, 12

BOILER = "This document is provided under the standard license terms."
ALPHA = "abcdefghijklmnopqrstuvwxyz "


def _rand_text(rng, n):
    return "".join(rng.choice(ALPHA) for _ in range(n))


def _docs():
    rng = random.Random(SEED)
    rows = []
    # 12 docs embedding the same boilerplate passage at varying offsets
    for i in range(12):
        rows.append((i, _rand_text(rng, rng.randrange(30, 120)) + BOILER
                     + _rand_text(rng, rng.randrange(10, 90))))
    # unique docs
    for i in range(12, 30):
        rows.append((i, _rand_text(rng, rng.randrange(0, 200))))
    rows += [(30, ""), (31, "short"), (32, BOILER)]  # edge sizes
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("documents", _docs())
    return con


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_docs())


def _match(spark_df, duck_df):
    got = spark_df.toPandas().reset_index(drop=True)
    want = duck_df.reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        assert str(got[c].dtype) == str(want[c].dtype), \
            f"col {c}: dtype {got[c].dtype} != {want[c].dtype}"
        assert got[c].equals(want[c]), f"col {c} differs"


WINNOW_SQL = f"""
WITH g AS (
  SELECT doc_id, i AS pos,
         substr(md5(substr(text, i + 1, {K})), 1, 15) AS fp
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0, length(text) - {K})) AS i)
  WHERE length(text) >= {K}
), keyed AS (
  SELECT doc_id, pos, fp,
         fp || '#' || lpad(CAST(pos AS VARCHAR), 9, '0') AS fkey
  FROM g
), sel AS (
  SELECT DISTINCT doc_id,
         CAST(string_split(m, '#')[2] AS INTEGER) AS pos,
         string_split(m, '#')[1] AS fp
  FROM (SELECT doc_id,
               min(fkey) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {W - 1} FOLLOWING) AS m
        FROM keyed)
)
SELECT doc_id, pos, fp FROM sel
"""

REGIONS_SQL = f"""
WITH sel AS ({WINNOW_SQL}), per_hash AS (
  SELECT fp, count(*) AS n_occ,
         min(struct_pack(doc_id := doc_id, pos := pos)) AS first_occ
  FROM sel GROUP BY fp
), marked AS (
  SELECT s.doc_id, s.pos AS start, s.pos + {K} AS "end"
  FROM sel s JOIN per_hash p USING (fp)
  WHERE p.n_occ >= 2
    AND NOT (s.doc_id = p.first_occ.doc_id AND s.pos = p.first_occ.pos)
), isl AS (
  SELECT *,
         CASE WHEN max("end") OVER (PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                IS NULL
              OR start > max("end") OVER (PARTITION BY doc_id
                ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + {W}
              THEN 1 ELSE 0 END AS new_isl
  FROM marked
), grp AS (
  SELECT *, sum(new_isl) OVER (PARTITION BY doc_id ORDER BY start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM isl
)
SELECT doc_id, CAST(min(start) AS INTEGER) AS start,
       CAST(max("end") AS INTEGER) AS "end"
FROM grp GROUP BY doc_id, isl
"""


def test_winnow_matches_duckdb(docs, duck):
    got = winnow_fingerprints(docs, k=K, w=W).orderBy("doc_id", "pos", "fp")
    want = duck.sql(WINNOW_SQL + " ORDER BY doc_id, pos, fp").fetchdf()
    _match(got, want)


def test_winnow_density_and_guarantee(docs):
    fps = winnow_fingerprints(docs, k=K, w=W).toPandas()
    # density: ~2/(w+1) of positions selected, never more than all
    lens = _docs().set_index("doc_id")["text"].str.len()
    for d, grp in fps.groupby("doc_id"):
        n = lens[d]
        assert len(grp) <= max(n - K + 1, 0)
    # guarantee: every pair of docs sharing BOILER (len 59 >= w+k-1=19)
    # shares at least one fingerprint hash
    boiler_docs = list(range(12)) + [32]
    sets = {d: set(fps[fps.doc_id == d].fp) for d in boiler_docs}
    for a in boiler_docs:
        for b in boiler_docs:
            if a < b:
                assert sets[a] & sets[b], (a, b)


def test_dup_regions_match_duckdb(docs, duck):
    got = dup_regions(docs, k=K, w=W).orderBy("doc_id", "start")
    want = duck.sql(REGIONS_SQL + " ORDER BY doc_id, start").fetchdf()
    _match(got, want)


def test_regions_cover_planted_duplicates(docs):
    regions = dup_regions(docs, k=K, w=W).toPandas()
    raw = _docs().set_index("doc_id")["text"]
    # exactly one canonical copy corpus-wide survives: at least one of the
    # 13 boiler docs keeps an uncovered boiler core
    uncovered = []
    for d in list(range(12)) + [32]:
        off = raw[d].find(BOILER)
        rs = regions[regions.doc_id == d]
        # interior of the passage (clear of the w+k-1 edge slack)
        core_lo, core_hi = off + W + K, off + len(BOILER) - (W + K)
        covered = any(r.start <= core_lo and r.end >= core_hi
                      for r in rs.itertuples())
        uncovered.append(not covered)
    assert sum(uncovered) >= 1          # a canonical copy survives
    assert sum(uncovered) <= 2          # nearly all copies are marked
    # unique random docs should have (almost) no regions
    noise = regions[regions.doc_id >= 12]
    noise = noise[noise.doc_id != 32]
    assert len(noise) <= 2


def test_excision_reconstruction_invariant(docs):
    out = excise_dup_substrings(docs, k=K, w=W).toPandas() \
        .set_index("doc_id")
    regions = dup_regions(docs, k=K, w=W).toPandas()
    raw = _docs().set_index("doc_id")["text"]
    for d in raw.index:
        rs = sorted(regions[regions.doc_id == d]
                    .itertuples(), key=lambda r: r.start)
        text = raw[d]
        expect = ""
        prev = 0
        for r in rs:
            expect += text[prev:r.start]
            prev = r.end
        expect += text[prev:]
        row = out.loc[d]
        assert row.clean_text == expect, d
        assert row.dup_chars == sum(r.end - r.start for r in rs)
        assert row.n_dup_regions == len(rs)
    # planted boilerplate is actually gone from the excised copies
    n_with_boiler = sum(BOILER in out.loc[d].clean_text
                       for d in list(range(12)) + [32])
    assert 1 <= n_with_boiler <= 2
