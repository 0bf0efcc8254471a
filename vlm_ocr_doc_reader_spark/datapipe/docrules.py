"""Gopher-style document quality rules (beyond the reference).

Named, individually-reported heuristic filters in the style of Rae et
al. 2021 (Gopher, Appendix A) / Penedo et al. 2023 (RefinedWeb): hard
per-document gates that precede any model-based quality scoring.  The
engine's ``textstats.quality_score`` gives a scalar; production corpus
work needs the *per-rule booleans* so a curation run can report WHICH
rule killed each document and ablate rules independently.

Everything is Catalyst-native (regexp counts + array ops over a single
line split), zero shuffle, whole-stage codegen — the 100-TB cost is one
scan.  Thresholds are keyword arguments; the defaults follow the
published Gopher ranges where a deterministic analog exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import token_count_col

# A deliberately tiny, fixed stopword probe (Gopher uses exactly this
# trick: require >=2 of a small English function-word list).
STOP_PROBE = ("the", "be", "to", "of", "and", "that", "have", "with")


def _frac(num: Column, den: Column) -> Column:
    """Exact ratio rounded to 6dp, 0.0 on empty denominators — the
    registry's dtype-deterministic division idiom."""
    return F.when(den == 0, F.lit(0.0)).otherwise(
        F.round(num.cast("decimal(18,6)") / den, 6).cast("double"))


def gopher_rules(df: DataFrame, text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_frac: float = 0.9,
                 max_ellipsis_frac: float = 0.3,
                 min_alpha_word_frac: float = 0.8,
                 min_stop_hits: int = 2) -> DataFrame:
    """Per-document rule flags + the conjunctive ``keep`` verdict.

    Rules (each an output boolean, True = rule passed):

    * ``r_word_count``   — whitespace word count in [min_words, max_words]
    * ``r_mean_word_len``— mean word length in [3, 10]
    * ``r_symbol_ratio`` — ('#' + '…' + '...') per word <= 0.1
    * ``r_bullet_lines`` — <=90% of lines start with a bullet marker
    * ``r_ellipsis_lines``— <=30% of lines end with an ellipsis
    * ``r_alpha_words``  — >=80% of words contain an alphabetic char
    * ``r_stopwords``    — >=2 distinct probe stopwords present

    Output: input columns + ``n_words`` + the 7 rule booleans + ``keep``.
    Diagnostic fractions stay internal — the booleans are the contract
    (fraction outputs would re-open the float-hash class; anything
    exported here is integer or boolean, plus one rounded mean).

    Scale: narrow projection only — regexp_count / array folds inside
    whole-stage codegen; no shuffle, no UDF, no collect.  At 10^12 docs
    this is exactly one pass over the text column, and Parquet column
    pruning means ONLY the text column."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    trimmed = F.trim(t)
    words = F.when(trimmed == "", F.array().cast("array<string>")) \
             .otherwise(F.split(trimmed, r"\s+"))
    n_words = F.size(words).cast("bigint")
    word_chars = F.aggregate(
        words, F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.length(w))
    mean_wlen = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.round(word_chars.cast("decimal(18,6)") / n_words, 6)
        .cast("double"))

    n_symbols = (F.regexp_count(t, F.lit(r"#"))
                 + F.regexp_count(t, F.lit("…"))
                 + F.regexp_count(t, F.lit(r"\.\.\.")))

    lines = F.filter(F.split(t, r"\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines).cast("bigint")
    n_bullet = F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike(r"^([-*•]|\d+[.)])\s")))
    n_ellipsis = F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$")))

    n_alpha_words = F.size(F.filter(
        words, lambda w: w.rlike(r"[A-Za-zА-яÀ-ÿ]")))

    low = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = F.size(F.filter(
        F.array(*[F.lit(s) for s in STOP_PROBE]),
        lambda s: low.contains(F.concat(F.lit(" "), s, F.lit(" ")))))

    out = (df
           .withColumn("n_words", n_words)
           .withColumn("mean_word_len", mean_wlen)
           .withColumn("r_word_count",
                       (n_words >= min_words) & (n_words <= max_words))
           .withColumn("r_mean_word_len",
                       (n_words > 0) & (mean_wlen >= min_mean_word_len)
                       & (mean_wlen <= max_mean_word_len))
           .withColumn("r_symbol_ratio",
                       _frac(n_symbols, n_words) <= max_symbol_ratio)
           .withColumn("r_bullet_lines",
                       _frac(n_bullet, n_lines) <= max_bullet_frac)
           .withColumn("r_ellipsis_lines",
                       _frac(n_ellipsis, n_lines) <= max_ellipsis_frac)
           .withColumn("r_alpha_words",
                       _frac(n_alpha_words, n_words) >= min_alpha_word_frac)
           .withColumn("r_stopwords", stop_hits >= min_stop_hits))
    keep = (F.col("r_word_count") & F.col("r_mean_word_len")
            & F.col("r_symbol_ratio") & F.col("r_bullet_lines")
            & F.col("r_ellipsis_lines") & F.col("r_alpha_words")
            & F.col("r_stopwords"))
    return out.withColumn("keep", keep)


def rule_report(flagged: DataFrame) -> DataFrame:
    """Corpus-level ablation view over ``gopher_rules`` output: per rule,
    how many documents fail it, and how many fail it UNIQUELY (the rule
    is the only one rejecting the doc) — the two numbers that tell you
    whether a threshold is load-bearing or redundant.

    Output: ``(rule, n_fail, n_sole_fail)``, one row per rule.  Scale:
    one narrow projection computing a fail-count per doc, then a single
    explode + hash aggregate over rule names (7x row fan-out of already-
    boolean columns, then reduction to 7 rows) — map-side combinable."""
    rules = ["r_word_count", "r_mean_word_len", "r_symbol_ratio",
             "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
             "r_stopwords"]
    n_fails = sum(F.when(~F.col(r), 1).otherwise(0) for r in rules)
    base = flagged.withColumn("_nf", n_fails)
    pairs = F.array(*[
        F.struct(F.lit(r).alias("rule"),
                 (~F.col(r)).alias("fail"),
                 ((~F.col(r)) & (F.col("_nf") == 1)).alias("sole"))
        for r in rules])
    return (base.select(F.explode(pairs).alias("p"))
            .groupBy(F.col("p.rule").alias("rule"))
            .agg(F.sum(F.col("p.fail").cast("long")).cast("bigint")
                 .alias("n_fail"),
                 F.sum(F.col("p.sole").cast("long")).cast("bigint")
                 .alias("n_sole_fail")))
