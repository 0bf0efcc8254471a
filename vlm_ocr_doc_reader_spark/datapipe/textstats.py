"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure Catalyst expressions (regexp/length/case) — the formulas are fixed
constants so every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# tiny per-language marker lists for the n-gram/stopword lang-id heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "die", "und"),
    "es": ("el", "la", "que"),
    "fr": ("le", "la", "et"),
    "ru": ("и", "в", "не"),
}

_WORD_SPLIT = r"\s+"


def token_count_col(text: Column) -> Column:
    """Whitespace token count; 0 for blank."""
    t = F.trim(text)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, _WORD_SPLIT)))


def bpe_ish_token_count_col(text: Column) -> Column:
    """BPE-ish upper bound: count word-piece matches of a subword regex
    (letters runs of <=4 chars, digit runs, single punctuation)."""
    return F.size(F.regexp_extract_all(
        F.coalesce(text, F.lit("")),
        F.lit(r"[A-Za-zА-Яа-яЁё]{1,4}|[0-9]+|[^\sA-Za-zА-Яа-яЁё0-9]"), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation ratio / stopword ratio features + a fixed-formula
    quality score in [0,1] (higher = more prose-like)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    n_tokens = token_count_col(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    low = F.lower(t)
    n_stop = F.size(F.regexp_extract_all(
        low, F.lit(r"\b(" + "|".join(STOPWORDS) + r")\b"), 0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    mean_word_len = F.when(n_tokens > 0,
                           (n_chars - n_tokens + 1) / n_tokens).otherwise(0.0)
    score = (
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))) * 0.3)
    return (df
            .withColumn("n_chars", n_chars.cast("long"))
            .withColumn("n_tokens", n_tokens.cast("long"))
            .withColumn("punct_ratio", F.round(punct_ratio, 6).cast("double"))
            .withColumn("stopword_ratio", F.round(stop_ratio, 6).cast("double"))
            .withColumn("mean_word_len",
                        F.round(mean_word_len, 6).cast("double"))
            .withColumn("quality_score", F.round(score, 6).cast("double")))


# script -> (language code, [lo, hi] codepoint range); a text whose dominant
# script is non-Latin is classified by script BEFORE the marker-word vote
# (marker lists can't cover unsegmented scripts like Han at all)
SCRIPT_RANGES = {
    "zh": ("一", "鿿"),   # CJK unified ideographs
    "ar": ("؀", "ۿ"),   # Arabic
    "ru": ("Ѐ", "ӿ"),   # Cyrillic
}


def _script_count(low: Column, lo: str, hi: str) -> Column:
    """Character count inside [lo, hi]: length minus the length with those
    chars removed — no per-char arrays, one linear regex pass."""
    return (F.length(low)
            - F.length(F.regexp_replace(low, f"[{lo}-{hi}]", "")))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two-stage language ID.

    Stage 1 — script dominance: count characters in the CJK / Arabic /
    Cyrillic ranges and in [a-z] (lowercased Latin); if a non-Latin script
    strictly dominates all other counted scripts, it decides directly
    (zh/ar/ru) — marker words are useless for unsegmented or non-Latin text.

    Stage 2 — marker-word vote (Latin-dominant or scriptless text): language
    with the most marker hits wins; ties broken by language code order; no
    hits -> 'und'.

    ONE regex pass for the markers: all markers are extracted with a single
    combined alternation, then per-language counts are cheap array filters
    over the extracted tokens.  Equivalent to per-language scans because
    markers are whole \\b-bounded tokens (no overlapping/prefix matches are
    possible), so the combined extraction is exactly the union of the
    per-language match sets — and the shared marker ('la') is counted by
    both filters.  Script counts add three narrow linear passes (length
    minus stripped length — no per-character arrays).  Everything stays a
    zero-shuffle per-row projection.
    """
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n_script = {code: _script_count(low, lo, hi)
                for code, (lo, hi) in SCRIPT_RANGES.items()}
    n_latin = F.length(low) - F.length(F.regexp_replace(low, "[a-z]", ""))
    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    combined = r"\b(" + "|".join(all_markers) + r")\b"
    tokens = F.regexp_extract_all(low, F.lit(combined), 0)
    hits = []
    for code in sorted(LANG_MARKERS):
        markers = LANG_MARKERS[code]
        n = F.size(F.filter(tokens, lambda x: x.isin(*markers)))
        hits.append((code, n))
    best = F.lit("und")
    best_n = F.lit(0)
    for code, n in hits:  # first max wins (codes pre-sorted)
        better = n > best_n
        best = F.when(better, F.lit(code)).otherwise(best)
        best_n = F.when(better, n).otherwise(best_n)

    # script dominance decides before the marker vote (codes in sorted
    # order for deterministic tie handling: strict > over all rivals)
    pred = best
    for code in sorted(SCRIPT_RANGES, reverse=True):
        rivals = [n for c, n in n_script.items() if c != code] + [n_latin]
        dominant = n_script[code] > F.greatest(*rivals) \
            if len(rivals) > 1 else n_script[code] > rivals[0]
        pred = F.when(dominant, F.lit(code)).otherwise(pred)
    return df.withColumn("pred_lang", pred)


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Document fingerprint: minimum md5 over word tokens (a 1-perm MinHash —
    stable under token reordering, portable to any SQL engine).
    Output: (id, fingerprint)."""
    t = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    toks = F.split(t, " ")
    return df.select(
        F.col(id_col).alias("id"),
        F.array_min(F.transform(toks, lambda x: F.md5(x)))
         .alias("fingerprint"))


# Fixed, published weights for the logistic quality classifier — a
# deterministic stand-in for a trained fastText/logreg quality model (the
# FineWeb/CCNet-style "model-based filter" stage).  The FEATURES are the
# oracled quality_features columns; swapping in trained weights changes
# nothing structural.
QUALITY_CLF_WEIGHTS = {
    "bias": -1.0,
    "stopword_ratio": 4.0,     # prose uses function words
    "punct_ratio": -6.0,       # symbol soup scores down
    "mean_word_len": 0.15,     # junk skews very short/very long
    "log_tokens": 0.35,        # enough content to judge
}


def quality_classifier(df: DataFrame, text_col: str = "text",
                       threshold: float = 0.5) -> DataFrame:
    """Model-based quality filtering, deterministically: a logistic score
    sigmoid(w . features) over the engine's oracled text features, plus a
    keep flag at ``threshold``.  Output: input + (clf_score double,
    clf_keep boolean).

    Scale shape: pure narrow Catalyst — the feature projection and the
    sigmoid are per-row expressions; nothing shuffles.  The score is a
    per-row function of the row alone, so it is trivially
    partition-invariant, and exp() cross-engine equality is pinned by the
    DuckDB gate (same precedent as lm_score's ln()).
    """
    w = QUALITY_CLF_WEIGHTS
    q = quality_features(df, text_col=text_col)
    z = (F.lit(w["bias"])
         + F.col("stopword_ratio") * w["stopword_ratio"]
         + F.col("punct_ratio") * w["punct_ratio"]
         + F.col("mean_word_len") * w["mean_word_len"]
         + F.log(F.col("n_tokens") + F.lit(1.0)) * w["log_tokens"])
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (q.withColumn("clf_score", F.round(score, 6).cast("double"))
            .withColumn("clf_keep", F.col("clf_score") >= threshold))


# Fixed scoring alphabet for char_entropy: per-character frequencies are
# measured over exactly these 37 symbols (lowercased letters, digits,
# space) so the counts come from len-diff expressions — narrow, no
# explode — and the entropy is a portable constant-alphabet quantity.
ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def char_entropy(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Shannon entropy (nats) of the per-document character distribution
    over :data:`ENTROPY_ALPHABET` — the classic gibberish/compression
    screen: natural prose sits ~2.5-3.2, repeated-char junk near 0,
    base64/hex blobs near the alphabet ceiling.

    Output: (id, n_alpha, char_entropy) — n_alpha is the number of
    in-alphabet characters; entropy is null when a document has none.

    Scale shape: one length-diff count expression per alphabet symbol
    (37 narrow JVM expressions), an array fold for the total and the
    entropy — zero shuffle, zero Python, trivially partition-invariant.
    Counts are exact integers; entropy is one rounded double per row
    (ln() cross-engine equality pinned by the gate, lm_score precedent).
    """
    low = F.lower(F.col(text_col))
    counts = F.array(*[
        (F.length(low) - F.length(F.replace(low, F.lit(ch), F.lit(""))))
        for ch in ENTROPY_ALPHABET])
    total = F.aggregate("_counts", F.lit(0), lambda a, x: a + x)
    ent = F.aggregate(
        "_counts", F.lit(0.0),
        lambda a, c: a + F.when(
            c > 0,
            -(c / F.col("n_alpha")) * F.log(c / F.col("n_alpha")))
        .otherwise(F.lit(0.0)))
    return (df
            .withColumn("_counts", counts)
            .withColumn("n_alpha", total.cast("bigint"))
            .withColumn("char_entropy",
                        F.when(F.col("n_alpha") > 0, F.round(ent, 6)))
            .select(F.col(id_col).alias("id"), "n_alpha", "char_entropy"))


def readability(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Flesch-style reading-ease score from deterministic text counts.

    flesch = 206.835 - 1.015 * (words/sentences) - 84.6 * (syl/words),
    with sentences = count of '[.!?]+' terminator runs (min 1) and the
    standard vowel-group syllable proxy syl = max(vowel_runs, words)
    (every word counts at least one syllable).  A fixed published
    formula over exact counts — not a model — so it is cross-engine
    oracle-able; null score for wordless documents.

    Output: (id, n_words, n_sentences, n_syllables, flesch).

    Scale shape: three regexp_extract_all counts per row, pure narrow
    Catalyst, zero shuffle.
    """
    # column-object API throughout: interpolating text_col into F.expr
    # breaks (or allows expression injection) for names that need
    # backtick quoting (ADVICE r6); regexp_extract_all accepts Columns
    t = F.col(text_col)
    n_words = token_count_col(t).cast("bigint")
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), F.lit(0))),
        F.lit(1)).cast("bigint")
    vowel_runs = F.size(
        F.regexp_extract_all(F.lower(t), F.lit("[aeiouy]+"), F.lit(0)))
    n_syl = F.greatest(vowel_runs.cast("bigint"), n_words)
    flesch = (F.lit(206.835)
              - F.lit(1.015) * (n_words / n_sent)
              - F.lit(84.6) * (n_syl / n_words))
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syl.alias("n_syllables"),
        F.when(n_words > 0, F.round(flesch, 6)).alias("flesch"))
