"""DuckDB-parity tests for the web-provenance (`datapipe/weburl.py`) and
Gopher-rule (`datapipe/docrules.py`) operators — staged for the r7 gate
window, certified under the driver comparator discipline (exact values,
dtype-strict, 6dp float rounding).

URLs are synthesized deterministically (the driver documents table has no
URL column — same pattern as the PII entry's synthesized inputs).
"""

import random

import duckdb
import pandas as pd
import pytest

from vlm_ocr_doc_reader_spark.datapipe.docrules import (gopher_rules,
                                                        rule_report)
from vlm_ocr_doc_reader_spark.datapipe.weburl import (domain_filter,
                                                      parse_urls, url_dedup)

SEED = 20260819

HOSTS = ["WWW.Example.co.uk", "news.example.co.uk", "example.com",
         "a.b.example.com", "sub.site.org", "192.168.10.4",
         "example.com:8080", "shop.example.com.au", "localhost"]
PATHS = ["", "/", "/a/b/c/", "/article/2024/spark", "/index.html"]
QUERIES = ["", "?utm_source=x&id=5", "?id=5&utm_medium=m",
           "?utm_source=x&utm_term=y", "?a=1&b=2", "?gclid=zz#frag",
           "#frag-only"]


def _url_frame(n=300):
    rng = random.Random(SEED)
    rows = []
    for i in range(n):
        u = ("https" if rng.random() < 0.7 else "http") + "://" + \
            rng.choice(HOSTS) + rng.choice(PATHS) + rng.choice(QUERIES)
        rows.append((i, u))
    rows += [(n, "not a url"), (n + 1, "ftp://files.example.com/x"),
             (n + 2, "https://example.com"),
             (n + 3, "https://example.com/?utm_source=o")]
    return pd.DataFrame(rows, columns=["doc_id", "url"])


def _doc_frame():
    rng = random.Random(SEED + 1)
    vocab = ["the", "pipeline", "emits", "spans", "and", "that", "rows",
             "of", "scan", "join", "x9", "##", "…"]
    rows = []
    for i in range(250):
        n = rng.randrange(0, 120)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    rows += [
        (250, ""),
        (251, "- one\n- two\n- three\n- four"),          # all bullets
        (252, "a b…\nc d…\ne f g h done."),              # ellipsis lines
        (253, "№ № № № № № № № № №" * 10),               # no alpha words
        (254, ("the quick brown fox jumps over and that is fine " * 8)),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("urls", _url_frame())
    con.register("documents", _doc_frame())
    return con


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame(_url_frame())


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_doc_frame())


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


# --- DuckDB twin fragments -------------------------------------------------

MULTI = "('co.uk','org.uk','gov.uk','ac.uk','com.au','net.au','org.au'," \
        "'co.jp','ne.jp','or.jp','com.br','com.cn','com.mx','co.in'," \
        "'co.kr','co.za','com.tr','com.ar')"
TRACK = "('utm_source','utm_medium','utm_campaign','utm_term'," \
        "'utm_content','gclid','fbclid','ref','mc_cid','mc_eid')"

PARSE_SQL = f"""
WITH p AS (
  SELECT *,
         lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))
           AS scheme0,
         lower(regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS host0,
         regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path0,
         regexp_extract(url, '\\?([^#]*)', 1) AS q0
  FROM urls
), q AS (
  SELECT *,
         list_filter(string_split(q0, '&'),
                     x -> x <> ''
                          AND NOT lower(string_split(x, '=')[1]) IN {TRACK})
           AS keptq,
         CASE WHEN path0 = '' THEN '/'
              ELSE CASE WHEN regexp_replace(path0, '/$', '') = '' THEN '/'
                        ELSE regexp_replace(path0, '/$', '') END END
           AS npath,
         regexp_replace(host0, ':[0-9]+$', '') AS hname
  FROM p
), d AS (
  SELECT *,
         CASE WHEN q0 = '' OR len(keptq) = 0 THEN NULL
              ELSE array_to_string(keptq, '&') END AS query0,
         CASE
           WHEN regexp_matches(hname,
                '^[0-9]{{1,3}}(\\.[0-9]{{1,3}}){{3}}$')
                OR len(string_split(hname, '.')) <= 2 THEN hname
           WHEN string_split(hname, '.')[-2] || '.'
                || string_split(hname, '.')[-1] IN {MULTI}
                AND len(string_split(hname, '.')) >= 3
             THEN string_split(hname, '.')[-3] || '.'
                  || string_split(hname, '.')[-2] || '.'
                  || string_split(hname, '.')[-1]
           ELSE string_split(hname, '.')[-2] || '.'
                || string_split(hname, '.')[-1]
         END AS dom0
  FROM q
)
SELECT doc_id, url,
       CASE WHEN scheme0 = '' OR host0 = '' THEN NULL ELSE scheme0 END
         AS scheme,
       CASE WHEN scheme0 = '' OR host0 = '' THEN NULL ELSE host0 END
         AS host,
       CASE WHEN scheme0 = '' OR host0 = '' THEN NULL ELSE dom0 END
         AS domain,
       CASE WHEN scheme0 = '' OR host0 = '' THEN NULL ELSE npath END
         AS path,
       CASE WHEN scheme0 = '' OR host0 = '' THEN NULL
            ELSE CAST(len(list_filter(string_split(npath, '/'),
                                      s -> s <> '')) AS INTEGER) END
         AS path_depth,
       CASE WHEN scheme0 = '' OR host0 = '' THEN NULL ELSE query0 END
         AS query,
       CASE WHEN scheme0 = '' OR host0 = '' THEN NULL
            ELSE scheme0 || '://' || regexp_replace(host0, ':(80|443)$', '')
                 || npath
                 || coalesce('?' || query0, '') END
         AS canonical_url
FROM d
"""


def test_parse_urls_matches_duckdb(urls, duck):
    got = parse_urls(urls).orderBy("doc_id")
    want = duck.sql(PARSE_SQL + " ORDER BY doc_id").fetchdf()
    _match(got, want)


def test_registered_domain_spotchecks(urls, spark):
    rows = {r.url: r for r in parse_urls(urls).collect()}
    by_host = {r.host: r.domain for r in rows.values() if r.host}
    assert by_host["www.example.co.uk"] == "example.co.uk"
    assert by_host["a.b.example.com"] == "example.com"
    assert by_host["shop.example.com.au"] == "example.com.au"
    assert by_host["192.168.10.4"] == "192.168.10.4"
    assert by_host["example.com:8080"] == "example.com"
    assert by_host["localhost"] == "localhost"
    assert rows["not a url"].canonical_url is None


def test_url_dedup_matches_duckdb(urls, duck):
    got = url_dedup(urls).orderBy("doc_id")
    want = duck.sql(f"""
        WITH parsed AS ({PARSE_SQL}), good AS (
          SELECT * FROM parsed WHERE canonical_url IS NOT NULL
        ), kept AS (
          SELECT min_by(good, doc_id) AS r,
                 CAST(count(*) AS BIGINT) AS n_url_dups
          FROM good GROUP BY canonical_url
        ), u AS (
          SELECT r.doc_id AS doc_id, r.url AS url, r.scheme AS scheme,
                 r.host AS host, r.domain AS domain, r.path AS path,
                 r.path_depth AS path_depth, r.query AS query,
                 r.canonical_url AS canonical_url, n_url_dups
          FROM kept
          UNION ALL
          SELECT doc_id, url, scheme, host, domain, path, path_depth,
                 query, canonical_url, CAST(1 AS BIGINT)
          FROM parsed WHERE canonical_url IS NULL
        )
        SELECT * FROM u ORDER BY doc_id
    """).fetchdf()
    _match(got, want)
    # survivors must be unique per canonical URL
    n = url_dedup(urls).filter("canonical_url IS NOT NULL").count()
    nd = url_dedup(urls).filter("canonical_url IS NOT NULL") \
        .select("canonical_url").distinct().count()
    assert n == nd


def test_domain_filter_broadcast_anti(urls, spark):
    blocked = spark.createDataFrame(
        pd.DataFrame({"domain": ["example.co.uk", "EXAMPLE.com.au"]}))
    out = domain_filter(urls, blocked)
    doms = {r.domain for r in out.collect()}
    assert "example.co.uk" not in doms and "example.com.au" not in doms
    assert "example.com" in doms          # only listed domains die
    assert None in doms                   # unparseable rows survive
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


GOPHER_SQL = """
WITH base AS (
  SELECT doc_id, text, coalesce(text, '') AS t FROM documents
), w AS (
  SELECT *,
         CASE WHEN trim(t) = '' THEN []
              ELSE string_split_regex(trim(t), '\\s+') END AS words,
         list_filter(string_split(t, chr(10)), x -> trim(x) <> '')
           AS lines
  FROM base
), c AS (
  SELECT *,
         CAST(len(words) AS BIGINT) AS n_words,
         list_sum(list_transform(words, x -> length(x))) AS word_chars,
         length(t) - length(replace(t, '#', ''))
           + length(t) - length(replace(t, '…', ''))
           + len(regexp_extract_all(t, '\\.\\.\\.')) AS n_symbols,
         CAST(len(lines) AS BIGINT) AS n_lines,
         len(list_filter(lines,
             x -> regexp_matches(trim(x), '^([-*•]|[0-9]+[.)])\\s')))
           AS n_bullet,
         len(list_filter(lines,
             x -> regexp_matches(trim(x), '(\\.\\.\\.|…)$')))
           AS n_ellipsis,
         len(list_filter(words,
             x -> regexp_matches(x, '[A-Za-zА-яÀ-ÿ]'))) AS n_alpha,
         len(list_filter(['the','be','to','of','and','that','have','with'],
             s -> contains(' ' || lower(t) || ' ', ' ' || s || ' ')))
           AS stop_hits
  FROM w
), m AS (
  SELECT *,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE round(CAST(coalesce(word_chars, 0) AS DECIMAL(18,6))
                         / n_words, 6)::DOUBLE END AS mean_word_len,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE round(CAST(n_symbols AS DECIMAL(18,6)) / n_words, 6)
                   ::DOUBLE END AS sym_frac,
         CASE WHEN n_lines = 0 THEN 0.0
              ELSE round(CAST(n_bullet AS DECIMAL(18,6)) / n_lines, 6)
                   ::DOUBLE END AS bullet_frac,
         CASE WHEN n_lines = 0 THEN 0.0
              ELSE round(CAST(n_ellipsis AS DECIMAL(18,6)) / n_lines, 6)
                   ::DOUBLE END AS ell_frac,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE round(CAST(n_alpha AS DECIMAL(18,6)) / n_words, 6)
                   ::DOUBLE END AS alpha_frac
  FROM c
)
SELECT doc_id, text, n_words, mean_word_len,
       n_words >= 10 AND n_words <= 100 AS r_word_count,
       n_words > 0 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         AS r_mean_word_len,
       sym_frac <= 0.1 AS r_symbol_ratio,
       bullet_frac <= 0.9 AS r_bullet_lines,
       ell_frac <= 0.3 AS r_ellipsis_lines,
       alpha_frac >= 0.8 AS r_alpha_words,
       stop_hits >= 2 AS r_stopwords,
       (n_words >= 10 AND n_words <= 100)
         AND (n_words > 0 AND mean_word_len >= 3.0
              AND mean_word_len <= 10.0)
         AND sym_frac <= 0.1 AND bullet_frac <= 0.9
         AND ell_frac <= 0.3 AND alpha_frac >= 0.8
         AND stop_hits >= 2 AS keep
FROM m
"""


def test_gopher_rules_matches_duckdb(docs, duck):
    got = (gopher_rules(docs, min_words=10, max_words=100)
           .orderBy("doc_id"))
    want = duck.sql(GOPHER_SQL + " ORDER BY doc_id").fetchdf()
    _match(got, want, float_cols=("mean_word_len",))


def test_gopher_edge_docs(docs):
    flags = {r.doc_id: r for r in
             gopher_rules(docs, min_words=10, max_words=100).collect()}
    assert not flags[250].keep and flags[250].n_words == 0
    assert not flags[251].r_bullet_lines          # 100% bullet lines
    assert not flags[252].r_ellipsis_lines        # 2/3 ellipsis lines
    assert not flags[253].r_alpha_words
    assert flags[254].keep                        # healthy prose passes


def test_rule_report_matches_manual(docs, spark):
    flagged = gopher_rules(docs, min_words=10, max_words=100)
    rep = {r.rule: r for r in rule_report(flagged).collect()}
    pdf = flagged.toPandas()
    rules = ["r_word_count", "r_mean_word_len", "r_symbol_ratio",
             "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
             "r_stopwords"]
    fails = ~pdf[rules]
    for r in rules:
        assert rep[r].n_fail == int(fails[r].sum())
        assert rep[r].n_sole_fail == int(
            (fails[r] & (fails.sum(axis=1) == 1)).sum())


def test_gopher_zero_shuffle_plan(docs):
    plan = gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
