"""Corpus reporting: the per-source "data card" every corpus release
ships with — volume, quality, language mix, duplication — as ONE composed
aggregate over the package's gated per-doc operators.

Scale shape: the per-doc stage is pure narrow Catalyst (quality features,
language ID, content digest — all existing oracled operators); the report
itself is a single hash aggregate on the source key plus a distinct-digest
count.  `countDistinct` inside the agg expands to a two-phase plan
(partial distinct per partition, then merge) — fine while per-source
distinct counts fit the agg buffers; a corpus with billions of docs per
source swaps the exact distinct for `sketches.kmv_sketch` per source and
keeps the rest of the report unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _norm
from .textstats import lang_id, quality_features


def corpus_report(docs: DataFrame, source_col: str = "source",
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """One row per source: (source, n_docs, total_tokens, mean_quality,
    en_share, n_unique, dup_rate, mean_chars)."""
    q = quality_features(docs, text_col=text_col)
    ql = lang_id(q, text_col=text_col)
    d = ql.withColumn("_digest", F.md5(_norm(F.col(text_col))))
    n_uniq = F.countDistinct("_digest")
    # quality_score is a fractional double: avg() over it is partial-sum-
    # order dependent, so accumulate exactly in decimal and divide once
    # (en_share / mean_chars average 0/1 and integer values — those sums
    # are exact in double at any order, no cast needed)
    mean_quality = F.round(
        F.sum(F.col("quality_score").cast("decimal(18,6)")).cast("double")
        / F.count("quality_score"), 6)
    return (d.groupBy(source_col)
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("total_tokens"),
                 mean_quality.alias("mean_quality"),
                 F.round(F.avg((F.col("pred_lang") == "en")
                               .cast("double")), 6).alias("en_share"),
                 n_uniq.cast("long").alias("n_unique"),
                 F.round(F.lit(1.0) - n_uniq / F.count("*"), 6)
                  .alias("dup_rate"),
                 F.round(F.avg("n_chars"), 6).alias("mean_chars")))


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Snapshot diff between two corpus versions: one row per doc_id seen
    in either snapshot with status 'added' / 'removed' / 'changed' /
    'unchanged' (by normalized content digest) — the release-to-release
    audit every versioned corpus ships with.

    Scale shape: both sides reduce to (id, digest) narrow projections
    before the single full-outer equi-join on the id — the join carries
    two 128-bit columns per row, never the text.
    """
    def digests(df):
        return df.select(F.col(id_col).alias("id"),
                         F.md5(_norm(F.col(text_col))).alias("digest"))
    a = digests(old).withColumnRenamed("digest", "old_digest")
    b = digests(new).withColumnRenamed("digest", "new_digest")
    j = a.join(b, "id", "full_outer")
    status = (F.when(F.col("old_digest").isNull(), "added")
              .when(F.col("new_digest").isNull(), "removed")
              .when(F.col("old_digest") == F.col("new_digest"), "unchanged")
              .otherwise("changed"))
    return j.select(F.col("id").alias(id_col), status.alias("status"))


def gini_concentration(df: DataFrame, key_col: str = "source") -> DataFrame:
    """Gini coefficient of the corpus's per-key document counts — the
    source-concentration monitor (0 = every source contributes equally,
    ->1 = one source dominates; data cards quote it next to the top-k
    source table, and a jump between snapshots means the crawl mix moved).

    Output: one row (n_keys, n_docs, gini) via the standard ordered form
    G = 2 * sum(i * x_i) / (n * sum(x)) - (n + 1) / n over counts x_i
    sorted ascending (ties broken by key, so ranking is deterministic).

    Scale shape: the corpus reduces to per-key counts first (one
    map-side-combinable hash aggregate — the only shuffle of data); the
    ordered-rank window runs over the reduced key frame (thousands of
    sources, not billions of rows; the documented single-partition
    window tradeoff shared with ks_statistic).  All sums are exact
    integer arithmetic — one rounded division at the end.
    """
    from pyspark.sql import Window
    counts = (df.filter(F.col(key_col).isNotNull())
              .groupBy(key_col).agg(F.count("*").alias("x")))
    ranked = counts.select(
        "x", F.row_number().over(
            Window.orderBy("x", key_col)).alias("i"))
    return ranked.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("x").cast("bigint").alias("n_docs"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x"))
            / (F.count("*") * F.sum("x"))
            - (F.count("*") + 1.0) / F.count("*"), 6).alias("gini"))
