"""DuckDB-parity tests for the round-6 staged operators (gate entries
planned for the r7 window — the registry and window are at capacity this
round, so these ship pytest-certified under the same cross-engine
comparator discipline the driver uses: exact value comparison after
6dp rounding, dtype-strict).

Covers: drift monitors (PSI / KS / chi-square), edit-distance fuzzy
vocabulary join, char entropy, readability, Zipf slope, Gini source
concentration — each against a hand-written DuckDB twin on seeded
synthetic frames — and PageRank against a dense NumPy power iteration
(iterative float fixpoint: the documented rows-only/pytest class).
"""

import math
import random

import duckdb
import numpy as np
import pandas as pd
import pytest

from vlm_ocr_doc_reader_spark.datapipe.drift import (chi_square_drift,
                                                     ks_statistic, psi)
from vlm_ocr_doc_reader_spark.datapipe.fuzzy import fuzzy_vocab_pairs
from vlm_ocr_doc_reader_spark.datapipe.graph import pagerank
from vlm_ocr_doc_reader_spark.datapipe.report import gini_concentration
from vlm_ocr_doc_reader_spark.datapipe.terms import zipf_slope
from vlm_ocr_doc_reader_spark.datapipe.textstats import (ENTROPY_ALPHABET,
                                                         char_entropy,
                                                         readability)

SEED = 20260817


def _metric_frames():
    rng = random.Random(SEED)
    ref = pd.DataFrame({
        "k": range(3000),
        "value": [round(rng.gauss(100.0, 15.0), 3) for _ in range(3000)],
        "cat": [rng.choice(["web", "pdf", "scan", "mail"])
                for _ in range(3000)],
    })
    cur = pd.DataFrame({
        "k": range(2400),
        # shifted + fattened tail, one brand-new category: real drift
        "value": [round(rng.gauss(108.0, 22.0), 3) for _ in range(2400)],
        "cat": [rng.choice(["web", "pdf", "scan", "api", "api"])
                for _ in range(2400)],
    })
    ref.loc[ref.index % 97 == 0, "value"] = None
    cur.loc[cur.index % 89 == 0, "value"] = None
    return ref, cur


WORD_SOUP = ["flange", "flanqe", "flang", "widget", "widgett", "wldget",
             "spark", "spork", "sparks", "table", "tible", "tabl",
             "join", "joint", "coin", "zzzz", "q1x9", "the", "a"]


def _docs_frame(n=400):
    rng = random.Random(SEED + 1)
    rows = []
    for i in range(n):
        words = [rng.choice(WORD_SOUP) for _ in range(rng.randrange(3, 40))]
        rows.append((i, " ".join(words),
                     rng.choice(["crawl-a", "crawl-a", "crawl-a",
                                 "crawl-b", "crawl-b", "vendor"])))
    rows.append((n, "", "vendor"))
    rows.append((n + 1, "   ", "vendor"))
    rows.append((n + 2, "One sentence. Two sentences! Three? Yes.",
                 "vendor"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "source"])


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    ref, cur = _metric_frames()
    docs = _docs_frame()
    con.register("ref", ref)
    con.register("cur", cur)
    con.register("documents", docs)
    return con


@pytest.fixture(scope="module")
def frames(spark):
    ref, cur = _metric_frames()
    docs = _docs_frame()
    return (spark.createDataFrame(ref), spark.createDataFrame(cur),
            spark.createDataFrame(docs))


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
            assert ((g == w) | both_nan).all(), \
                f"col {c}: {g[(g != w) & ~both_nan].head()} vs " \
                f"{w[(g != w) & ~both_nan].head()}"
        else:
            # dtype-strict comparison, the driver's failure mode
            assert str(g.dtype) == str(w.dtype), \
                f"col {c}: dtype {g.dtype} != {w.dtype}"
            assert g.equals(w), f"col {c} differs"


def test_psi_matches_duckdb(frames, duck):
    ref, cur, _ = frames
    qs = ", ".join(str(i / 10) for i in range(1, 10))
    sql = f"""
    WITH e AS (
      SELECT list_transform(quantile_cont(value, [{qs}]),
                            x -> round(x, 6)) AS qs
      FROM ref WHERE value IS NOT NULL
    ), rc AS (
      SELECT len(list_filter(e.qs, q -> r.value > q)) AS bin,
             count(*) AS n FROM ref r, e WHERE r.value IS NOT NULL
      GROUP BY 1
    ), cc AS (
      SELECT len(list_filter(e.qs, q -> c.value > q)) AS bin,
             count(*) AS n FROM cur c, e WHERE c.value IS NOT NULL
      GROUP BY 1
    ), tot AS (
      SELECT (SELECT count(*) FROM ref WHERE value IS NOT NULL) AS t_ref,
             (SELECT count(*) FROM cur WHERE value IS NOT NULL) AS t_cur
    ), bins AS (SELECT unnest(generate_series(0, 9)) AS bin)
    SELECT CAST(b.bin AS INT) AS bin,
           CAST(coalesce(rc.n, 0) AS BIGINT) AS n_ref,
           CAST(coalesce(cc.n, 0) AS BIGINT) AS n_cur,
           round((coalesce(rc.n, 0) + 1) / (t.t_ref + 10), 6) AS p_ref,
           round((coalesce(cc.n, 0) + 1) / (t.t_cur + 10), 6) AS p_cur,
           round(((coalesce(cc.n, 0) + 1) / (t.t_cur + 10)
                  - (coalesce(rc.n, 0) + 1) / (t.t_ref + 10))
                 * ln(((coalesce(cc.n, 0) + 1) / (t.t_cur + 10))
                      / ((coalesce(rc.n, 0) + 1) / (t.t_ref + 10))), 6)
             AS psi_term
    FROM bins b LEFT JOIN rc ON rc.bin = b.bin
    LEFT JOIN cc ON cc.bin = b.bin CROSS JOIN tot t
    ORDER BY 1
    """
    got = psi(ref, cur, "value", n_bins=10)
    _match(got, duck.execute(sql).fetchdf(),
           float_cols=("p_ref", "p_cur", "psi_term"))
    # drifted snapshot: total PSI must register as at least moderate
    total = sum(r.psi_term for r in got.collect())
    assert total > 0.1


def test_ks_matches_duckdb(frames, duck):
    ref, cur, _ = frames
    sql = """
    WITH a AS (SELECT value AS v, count(*) AS ca FROM ref
               WHERE value IS NOT NULL GROUP BY 1),
    b AS (SELECT value AS v, count(*) AS cb FROM cur
          WHERE value IS NOT NULL GROUP BY 1),
    m AS (SELECT coalesce(a.v, b.v) AS v, coalesce(ca, 0) AS ca,
                 coalesce(cb, 0) AS cb
          FROM a FULL OUTER JOIN b ON a.v = b.v),
    c AS (SELECT sum(ca) OVER w AS cum_a, sum(cb) OVER w AS cum_b,
                 sum(ca) OVER () AS n_a, sum(cb) OVER () AS n_b
          FROM m WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING))
    SELECT CAST(max(n_a) AS BIGINT) AS n_a,
           CAST(max(n_b) AS BIGINT) AS n_b,
           round(max(abs(cum_a / n_a - cum_b / n_b)), 6) AS d_stat
    FROM c
    """
    _match(ks_statistic(ref, cur, "value"), duck.execute(sql).fetchdf(),
           float_cols=("d_stat",))


def test_ks_identical_distribution_is_zero(frames):
    ref, _, _ = frames
    d = ks_statistic(ref, ref, "value").collect()[0]
    assert d.d_stat == 0.0


def test_ks_cardinality_guard(frames):
    """The exact-ECDF window is single-partition; a continuous
    high-cardinality column must be refused with the binning
    remediation, not silently funneled through one task."""
    ref, cur, _ = frames
    with pytest.raises(ValueError, match="distinct values.*bin"):
        ks_statistic(ref, cur, "value", max_points=10)
    # None disables the guard (and skips its count job)
    d = ks_statistic(ref, ref, "value", max_points=None).collect()[0]
    assert d.d_stat == 0.0


def test_chi_square_matches_duckdb(frames, duck):
    ref, cur, _ = frames
    sql = """
    WITH rc AS (SELECT cat AS category, count(*) AS n_ref FROM ref
                WHERE cat IS NOT NULL GROUP BY 1),
    cc AS (SELECT cat AS category, count(*) AS n_cur FROM cur
           WHERE cat IS NOT NULL GROUP BY 1),
    m AS (SELECT coalesce(rc.category, cc.category) AS category,
                 coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
          FROM rc FULL OUTER JOIN cc ON rc.category = cc.category),
    t AS (SELECT count(*) AS k, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur
          FROM m)
    SELECT m.category, CAST(m.n_ref AS BIGINT) AS n_ref,
           CAST(m.n_cur AS BIGINT) AS n_cur,
           round((m.n_ref + 1) / (t.t_ref + t.k) * t.t_cur, 6)
             AS expected_cur,
           round(pow(m.n_cur - (m.n_ref + 1) / (t.t_ref + t.k) * t.t_cur,
                     2)
                 / ((m.n_ref + 1) / (t.t_ref + t.k) * t.t_cur), 6)
             AS chi2_term
    FROM m CROSS JOIN t ORDER BY 1
    """
    got = chi_square_drift(ref, cur, "cat")
    _match(got, duck.execute(sql).fetchdf(),
           float_cols=("expected_cur", "chi2_term"))
    # the brand-new 'api' category must dominate the drift terms
    rows = {r.category: r.chi2_term for r in got.collect()}
    assert rows["api"] == max(rows.values())


def test_fuzzy_pairs_match_duckdb(frames, duck):
    _, _, docs = frames
    sql = """
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(regexp_replace(
        trim(text), '\\s+', ' ', 'g')), ' '), x -> x <> '')) AS w
      FROM documents
    ), v AS (
      SELECT w AS word, count(*) AS n FROM toks
      WHERE length(w) >= 4 GROUP BY 1 HAVING count(*) >= 2
    )
    SELECT a.word AS word_a, b.word AS word_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           CAST(levenshtein(a.word, b.word) AS INT) AS dist
    FROM v a JOIN v b
      ON a.word < b.word
     AND abs(length(a.word) - length(b.word)) <= 1
     AND levenshtein(a.word, b.word) <= 1
    ORDER BY 1, 2
    """
    got = fuzzy_vocab_pairs(docs, max_dist=1, min_len=4, min_count=2)
    want = duck.execute(sql).fetchdf()
    _match(got, want)
    assert len(want) > 0  # the soup is built to collide


def test_fuzzy_blocking_is_lossless_at_dist_1(spark):
    # brute-force O(V^2) ground truth on a small vocabulary, incl. edits
    # at the first char, the last char, the middle, and length +/- 1
    words = ["abcd", "xbcd", "abcx", "abxd", "bcd", "abcde", "abcd",
             "qqqq", "qqq", "zabcd"]
    docs = spark.createDataFrame(
        [(i, " ".join(words)) for i in range(2)], ["doc_id", "text"])
    got = {(r.word_a, r.word_b)
           for r in fuzzy_vocab_pairs(docs, max_dist=1, min_len=3,
                                      min_count=1).collect()}
    vocab = sorted(set(words))

    def lev(a, b):
        m = [[i + j if not i * j else 0 for j in range(len(b) + 1)]
             for i in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = min(m[i - 1][j] + 1, m[i][j - 1] + 1,
                              m[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        return m[len(a)][len(b)]

    want = {(a, b) for a in vocab for b in vocab
            if a < b and lev(a, b) <= 1}
    assert got == want


def test_char_entropy_matches_duckdb(frames, duck):
    _, _, docs = frames
    diffs = ", ".join(
        f"length(low) - length(replace(low, '{ch}', ''))"
        for ch in ENTROPY_ALPHABET)
    sql = f"""
    WITH base AS (SELECT doc_id, lower(text) AS low FROM documents),
    c AS (SELECT doc_id, [{diffs}] AS counts FROM base),
    t AS (SELECT doc_id, counts, list_sum(counts) AS tot FROM c)
    SELECT doc_id AS id, CAST(tot AS BIGINT) AS n_alpha,
           CASE WHEN tot > 0 THEN round(list_sum(list_transform(
             counts, x -> CASE WHEN x > 0
                          THEN -(x / tot) * ln(x / tot)
                          ELSE 0.0 END)), 6) END AS char_entropy
    FROM t ORDER BY 1
    """
    got = char_entropy(docs).orderBy("id")
    _match(got, duck.execute(sql).fetchdf(), float_cols=("char_entropy",))
    # sanity: prose entropy lands in the natural-language band
    vals = [r.char_entropy for r in got.collect() if r.char_entropy]
    assert all(0.5 < v < math.log(len(ENTROPY_ALPHABET)) for v in vals)


def test_readability_matches_duckdb(frames, duck):
    _, _, docs = frames
    sql = r"""
    SELECT doc_id AS id,
      CAST(CASE WHEN trim(text) = '' THEN 0
           ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
        AS n_words,
      CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
        AS n_sentences,
      CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')),
           CASE WHEN trim(text) = '' THEN 0
           ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT)
        AS n_syllables,
      CASE WHEN (CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+')) END) > 0
      THEN round(206.835
        - 1.015 * ((CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END)
                   / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
        - 84.6 * (greatest(len(regexp_extract_all(lower(text),
                                                  '[aeiouy]+')),
                  CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END)
                  / (CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+'))
                     END)), 6)
      END AS flesch
    FROM documents ORDER BY 1
    """
    _match(readability(docs).orderBy("id"), duck.execute(sql).fetchdf(),
           float_cols=("flesch",))


def test_zipf_slope_matches_duckdb(frames, duck):
    _, _, docs = frames
    sql = """
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(regexp_replace(
        trim(text), '\\s+', ' ', 'g')), ' '), x -> x <> '')) AS w
      FROM documents
    ), counts AS (SELECT w AS token, count(*) AS c FROM toks GROUP BY 1),
    topk AS (SELECT * FROM counts ORDER BY c DESC, token LIMIT 15),
    r AS (SELECT row_number() OVER (ORDER BY c DESC, token) AS rank, c
          FROM topk),
    s AS (SELECT round(ln(CAST(rank AS DOUBLE)), 12) AS lx,
                 round(ln(CAST(c AS DOUBLE)), 12) AS ly FROM r),
    agg AS (SELECT count(*) AS n,
                   sum(CAST(lx AS DECIMAL(28,12))) AS sx,
                   sum(CAST(ly AS DECIMAL(28,12))) AS sy,
                   sum(CAST(round(lx * ly, 12) AS DECIMAL(28,12))) AS sxy,
                   sum(CAST(round(lx * lx, 12) AS DECIMAL(28,12))) AS sxx
            FROM s)
    SELECT CAST(n AS BIGINT) AS n_terms,
      round((n * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (n * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
      round((CAST(sy AS DOUBLE)
             - (n * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (n * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * CAST(sx AS DOUBLE)) / n, 6) AS intercept
    FROM agg
    """
    got = zipf_slope(docs, k=15)
    _match(got, duck.execute(sql).fetchdf(),
           float_cols=("slope", "intercept"))
    assert got.collect()[0].slope < 0  # frequency falls with rank


def test_gini_matches_duckdb(frames, duck):
    _, _, docs = frames
    sql = """
    WITH counts AS (SELECT source, count(*) AS x FROM documents
                    WHERE source IS NOT NULL GROUP BY 1),
    r AS (SELECT x, row_number() OVER (ORDER BY x, source) AS i
          FROM counts)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(x) AS BIGINT) AS n_docs,
           round(2.0 * sum(i * x) / (count(*) * sum(x))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM r
    """
    _match(gini_concentration(docs, "source"), duck.execute(sql).fetchdf(),
           float_cols=("gini",))


def test_gini_uniform_is_zero(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(40)], ["doc_id", "source"])
    assert gini_concentration(df, "source").collect()[0].gini == 0.0


def _numpy_pagerank(edges, n, d=0.85, iters=15):
    adj = np.zeros((n, n))
    for s, t in edges:
        adj[s, t] = 1.0
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s in range(n):
            if deg[s] > 0:
                contrib += adj[s] * (r[s] / deg[s])
        dangling = r[deg == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return r


def test_pagerank_matches_numpy(spark):
    rng = random.Random(SEED + 2)
    n = 60
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(300)}
    # a few guaranteed dangling nodes: strip all out-edges of nodes 0-4
    edges = {(s, t) for (s, t) in edges if s >= 5}
    df = spark.createDataFrame(sorted(edges), ["src", "dst"])
    got = {r.id: r.rank for r in pagerank(df, iterations=15).collect()}
    # the operator's node universe is the nodes seen in edges — build the
    # dense reference over exactly that set
    seen = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {node: i for i, node in enumerate(seen)}
    dense = [(idx[s], idx[t]) for s, t in sorted(edges)]
    want = _numpy_pagerank(dense, len(seen))
    assert set(got) == set(seen)
    for node in seen:
        assert got[node] == pytest.approx(want[idx[node]], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_ring_is_uniform(spark):
    n = 8
    df = spark.createDataFrame([(i, (i + 1) % n) for i in range(n)],
                               ["src", "dst"])
    ranks = [r.rank for r in pagerank(df, iterations=20).collect()]
    assert all(r == pytest.approx(1.0 / n, abs=1e-9) for r in ranks)
