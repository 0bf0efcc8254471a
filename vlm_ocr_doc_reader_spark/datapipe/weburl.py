"""Web-provenance operators: URL parsing, canonicalization, URL-level
dedup and domain blocklisting (beyond the reference, which ingests local
PDF paths only — ``core/config.py``'s input root).  A 100-TB web corpus
is keyed by URL before it is keyed by content: C4/RefinedWeb-style
pipelines dedupe on canonical URL first (cheap, exact) and hold domain
block/allow lists that must join against *registered domain*, not host.

All parsing is Catalyst-native (``regexp_extract`` / ``split`` /
``filter`` on the query-param array) — zero shuffle, zero Python.  The
registered-domain cut uses a literal multi-label public-suffix set
(co.uk-class) — the full PSL would ship the same way: a broadcast literal
array (it is ~10k entries, trivially driver-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multi-label public suffixes the heuristic recognizes (second level of a
# ccTLD).  Real deployments swap in the full Public Suffix List — same
# dataflow, a bigger literal.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.tr", "com.ar",
)

# Query parameters stripped during canonicalization (tracking noise).
TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "utm_term",
                   "utm_content", "gclid", "fbclid", "ref", "mc_cid",
                   "mc_eid")


def _host(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))


def registered_domain(host: Column) -> Column:
    """Registered (pay-level) domain of a lowercase host: last two labels,
    or last three when the trailing two are a known multi-label public
    suffix.  Port suffixes are removed first; IP literals pass through
    unchanged (no label logic applies)."""
    h = F.regexp_replace(host, r":\d+$", "")
    is_ip = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.when(n >= 3, F.concat_ws(".", F.element_at(parts, -3),
                                       F.element_at(parts, -2),
                                       F.element_at(parts, -1)))
    multi = last2.isin(*MULTI_SUFFIXES)
    return (F.when(is_ip | (n <= 2), h)
            .when(multi & (n >= 3), last3)
            .otherwise(last2))


def canonical_query(url: Column) -> Column:
    """Query string minus tracking params, original param order preserved;
    NULL when nothing survives (so canonical URLs drop the '?')."""
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~F.lower(F.split(p, "=")[0])
        .isin(*TRACKING_PARAMS))
    return F.when((q == "") | (F.size(kept) == 0),
                  F.lit(None).cast("string")) \
            .otherwise(F.concat_ws("&", kept))


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Structured view of a URL column: scheme, host (lowercased, port
    stripped for the domain cut but kept in ``host``), registered domain,
    path, path depth, surviving query, and the canonical URL (lowercase
    scheme+host, fragment dropped, tracking params dropped, trailing
    slash normalized off non-root paths).

    Adds columns; preserves every input row and column.  Scale: pure
    narrow projection — whole-stage-codegen regexps, no shuffle."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = _host(u)
    path = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    norm_path = F.when(path == "", F.lit("/")) \
                 .otherwise(F.regexp_replace(path, r"/$", ""))
    norm_path2 = F.when(norm_path == "", F.lit("/")).otherwise(norm_path)
    depth = F.size(F.filter(F.split(norm_path2, "/"), lambda s: s != ""))
    query = canonical_query(u)
    canon = F.concat(
        scheme, F.lit("://"), F.regexp_replace(host, r":(80|443)$", ""),
        norm_path2,
        F.coalesce(F.concat(F.lit("?"), query), F.lit("")))
    bad = (scheme == "") | (host == "")
    return (df
            .withColumn("scheme", F.when(bad, None).otherwise(scheme))
            .withColumn("host", F.when(bad, None).otherwise(host))
            .withColumn("domain",
                        F.when(bad, None).otherwise(registered_domain(host)))
            .withColumn("path", F.when(bad, None).otherwise(norm_path2))
            .withColumn("path_depth",
                        F.when(bad, None).otherwise(depth).cast("int"))
            .withColumn("query", F.when(bad, None).otherwise(query))
            .withColumn("canonical_url",
                        F.when(bad, None).otherwise(canon)))


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """URL-level exact dedup: keep the row with the smallest id per
    canonical URL (deterministic survivor), rows with unparseable URLs
    kept unconditionally.  The cheap first pass every web pipeline runs
    before any content hashing.

    Output: input rows + parse columns + ``n_url_dups`` (total rows that
    shared the canonical URL).  Scale: one ``min_by``-style hash
    aggregate keyed by canonical URL — map-side combinable, no window,
    no sort; canonical-URL cardinality ~ corpus rows but each group
    reduces to one struct."""
    parsed = parse_urls(df, url_col)
    bad = parsed.filter(F.col("canonical_url").isNull()) \
                .withColumn("n_url_dups", F.lit(1).cast("bigint"))
    good = parsed.filter(F.col("canonical_url").isNotNull())
    cols = [c for c in parsed.columns]
    packed = good.select(
        "canonical_url",
        F.struct(*[F.col(c) for c in cols if c != "canonical_url"])
        .alias("row"))
    kept = (packed.groupBy("canonical_url")
            .agg(F.min_by("row", F.col("row")[id_col]).alias("row"),
                 F.count(F.lit(1)).cast("bigint").alias("n_url_dups")))
    unpacked = kept.select(
        *[F.col(f"row.{c}").alias(c) for c in cols if c != "canonical_url"],
        "canonical_url", "n_url_dups")
    return unpacked.unionByName(bad.select(*unpacked.columns))


def domain_filter(df: DataFrame, blocked: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Drop rows whose registered domain appears in ``blocked``
    (one column ``domain``).  Rows with unparseable URLs are kept —
    blocklists must not silently eat malformed provenance; route those
    to quarantine separately if desired.

    Scale: broadcast ``left_anti`` join — blocklists are dimension-sized
    (at most millions of domains, megabytes); the corpus side never
    shuffles."""
    parsed = parse_urls(df, url_col)
    return parsed.join(
        F.broadcast(blocked.select(F.lower("domain").alias("domain"))
                    .dropDuplicates(["domain"])),
        on="domain", how="left_anti")
