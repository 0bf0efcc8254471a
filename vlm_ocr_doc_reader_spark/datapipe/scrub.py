"""Corpus scrubbing for training-data pipelines: PII redaction and
repetition (low-quality boilerplate) statistics.

Pure Catalyst expressions (regexp_replace / array folds) — JVM-side,
whole-stage codegen, exact DuckDB oracles.  Regex subset is common to Java
regex and RE2 (no backrefs/lookaround), so Spark and DuckDB agree
byte-for-byte; \\d and \\s are ASCII in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Redaction order matters (emails contain dots like IPs; phones are digit
# runs): emails -> IPs -> phones.  Both sides apply the SAME order.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\-() ]{7,}\d"

EMAIL_TOKEN, IP_TOKEN, PHONE_TOKEN = "<EMAIL>", "<IP>", "<PHONE>"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-type PII counts and a redacted text column.

    One narrow projection per row — three regex passes (count+replace fuse
    into the same codegen stage); no shuffle anywhere.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    t1 = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(IP_RE), 0))
    t2 = F.regexp_replace(t1, IP_RE, IP_TOKEN)
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PHONE_RE), 0))
    t3 = F.regexp_replace(t2, PHONE_RE, PHONE_TOKEN)
    return (df
            .withColumn("n_emails", n_emails.cast("int"))
            .withColumn("n_ips", n_ips.cast("int"))
            .withColumn("n_phones", n_phones.cast("int"))
            .withColumn("redacted", t3))


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition features, computed per row with ZERO shuffle:

      n_words           whitespace tokens (non-empty)
      n_distinct        distinct tokens
      dup_ratio         1 - n_distinct / n_words   (0 for empty docs)
      top_word_ratio    count of the most frequent token / n_words

    The most-frequent-token count is the longest equal-run in the SORTED
    token array — one array_sort + one linear fold (struct accumulator),
    instead of an explode + groupBy exchange.
    """
    words = F.filter(
        F.split(F.lower(F.regexp_replace(F.trim(F.coalesce(
            F.col(text_col), F.lit(""))), r"\s+", " ")), " "),
        lambda x: x != "")
    n = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    sorted_w = F.array_sort(words)
    # fold: acc = (prev, cur_run, best_run)
    acc0 = F.struct(F.lit("").alias("prev"),
                    F.lit(0).cast("long").alias("cur"),
                    F.lit(0).cast("long").alias("best"))
    folded = F.aggregate(
        sorted_w, acc0,
        lambda a, w: F.struct(
            w.alias("prev"),
            F.when(w == a.prev, a.cur + 1).otherwise(F.lit(1).cast("long"))
             .alias("cur"),
            F.greatest(
                a.best,
                F.when(w == a.prev, a.cur + 1)
                 .otherwise(F.lit(1).cast("long"))).alias("best")))
    top = folded.best
    return df.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_words"),
        n_distinct.cast("long").alias("n_distinct"),
        F.round(F.when(n > 0, 1.0 - n_distinct / n).otherwise(0.0), 6)
         .cast("double").alias("dup_ratio"),
        F.round(F.when(n > 0, top / n).otherwise(0.0), 6)
         .cast("double").alias("top_word_ratio"))
