"""Edit-distance fuzzy matching over the corpus vocabulary.

OCR output and web text carry near-identical token variants — scanner
misreads ('flange'/'flanqe'), typos, hyphenation debris.  Normalizing
them needs the pairs of vocabulary words within a small Levenshtein
distance; the naive form is an O(V^2) self-join, unusable at a
100-TB-corpus vocabulary.

``fuzzy_vocab_pairs`` makes the join tractable AND exact (at the
default ``max_dist=1``) with equi-join blocking: a single edit can
change a word's first character or its last, never both (for words of
length >= 2), so every distance-1 pair agrees on the first char or on
the last.  The probe side explodes each word to its three candidate
lengths (len-1, len, len+1); two hash equi-joins — on (length,
first_char) and (length, last_char) — propose candidates, a union
dedups them, and ``levenshtein() <= max_dist`` disposes.  For
``max_dist >= 2`` the same blocking is a documented-recall heuristic
(pairs altering both ends are missed) — the flag to reach for before an
exact quadratic pass.

Scale shape: the corpus reduces to a (word, count) vocabulary first
(Heaps' law: sublinear in corpus size, millions of rows at 100 TB, one
map-side-combinable aggregate).  Everything after runs on the
vocabulary: the 3x length explode is narrow, both candidate joins are
equi-joins on well-spread (length, char) keys, and `levenshtein` is a
JVM built-in (no Python).  Nothing is quadratic except within a
blocking bucket, and ``min_count``/``min_len`` prune the hapax tail
that dominates vocabulary size.

Cross-engine: Spark ``levenshtein`` == DuckDB ``levenshtein`` (both
unit-cost edit distance), counts-only elsewhere — gate-oracle-ready
(r7 window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _norm


def vocab(df: DataFrame, text_col: str = "text", min_len: int = 2,
          min_count: int = 1) -> DataFrame:
    """(word, n) corpus vocabulary over whitespace tokens of
    ``text_col``, pruned to length >= min_len and count >= min_count."""
    return (df
            .select(F.explode(F.split(_norm(F.col(text_col)), " "))
                     .alias("word"))
            .filter(F.length("word") >= min_len)
            .groupBy("word").agg(F.count("*").alias("n"))
            .filter(F.col("n") >= min_count))


def fuzzy_vocab_pairs(df: DataFrame, text_col: str = "text",
                      max_dist: int = 1, min_len: int = 4,
                      min_count: int = 2) -> DataFrame:
    """Vocabulary word pairs within ``max_dist`` Levenshtein edits.

    Output: (word_a, word_b, n_a, n_b, dist) with word_a < word_b,
    ordered by (word_a, word_b).  Exact (all qualifying pairs) for
    ``max_dist=1``; documented-recall blocking above that (see module
    docstring).  ``min_len >= 2`` is required — the first-or-last-char
    argument needs two characters to stand on.
    """
    if min_len < 2:
        raise ValueError("fuzzy_vocab_pairs: need min_len >= 2")
    v = vocab(df, text_col, min_len=min_len, min_count=min_count)
    left = v.select(
        F.col("word").alias("word_a"), F.col("n").alias("n_a"),
        F.explode(F.array(*[F.length("word") + d
                            for d in range(-max_dist, max_dist + 1)]))
         .alias("len_probe"),
        F.substring("word", 1, 1).alias("first_a"),
        F.substring(F.col("word"), -1, 1).alias("last_a"))
    right = v.select(
        F.col("word").alias("word_b"), F.col("n").alias("n_b"),
        F.length("word").alias("len_b"),
        F.substring("word", 1, 1).alias("first_b"),
        F.substring(F.col("word"), -1, 1).alias("last_b"))

    by_first = left.join(
        right,
        (F.col("len_probe") == F.col("len_b"))
        & (F.col("first_a") == F.col("first_b"))
        & (F.col("word_a") < F.col("word_b")))
    by_last = left.join(
        right,
        (F.col("len_probe") == F.col("len_b"))
        & (F.col("last_a") == F.col("last_b"))
        & (F.col("word_a") < F.col("word_b")))
    cand = (by_first.select("word_a", "word_b", "n_a", "n_b")
            .unionByName(by_last.select("word_a", "word_b", "n_a", "n_b"))
            .dropDuplicates(["word_a", "word_b"]))
    return (cand
            .withColumn("dist", F.levenshtein("word_a", "word_b"))
            .filter(F.col("dist") <= max_dist)
            .select("word_a", "word_b",
                    F.col("n_a").cast("bigint").alias("n_a"),
                    F.col("n_b").cast("bigint").alias("n_b"),
                    F.col("dist").cast("int").alias("dist"))
            .orderBy("word_a", "word_b"))
