"""Training-set assembly: the last mile between a curated corpus and a
training run — deterministic epoch shuffling, fixed-budget sequence
packing, and source-mixture sampling.

Everything is md5-keyed (same construction as datapipe/sampling.py), so
assembly is reproducible across runs, engines, and repartitioning — a
training order must be a pure function of (seed, doc identity), never of
partition layout.  All three operators have exact DuckDB oracles.

Scale shapes:
  * epoch shuffle: a narrow key projection; the ORDER lives in the key,
    so "shuffling" is just sorting by it wherever ordering is consumed —
    no extra pass, no RNG state.
  * sequence packing: docs are salted into ``n_streams`` independent
    streams (narrow), packed by ONE cumulative-sum window per stream —
    the window exchange is the only shuffle and each stream's partition
    holds corpus/n_streams rows.  A single global window would serialize
    on one reducer at 100 TB; per-stream packing is embarrassingly
    parallel and each stream is a valid training shard.
  * mixture sampling: per-source deterministic rate filter (narrow);
    rates come from a driver-side dict computed on per-source token
    totals (a tiny aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_uniform_col  # md5-keyed U[0,1) draw
from .textstats import token_count_col


def epoch_key(id_col: str = "doc_id", seed: int = 0) -> Column:
    """Deterministic epoch-shuffle sort key: md5(seed || ':' || id).
    Different seeds give independent orders; ordering by the key anywhere
    (write_sorted, pack_sequences) realizes the shuffle."""
    return F.md5(F.concat(F.lit(str(seed)), F.lit(":"),
                          F.col(id_col).cast("string")))


def pack_sequences(df: DataFrame, token_budget: int,
                   n_streams: int = 64, seed: int = 0,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Assign every doc a (stream, seq_id, seq_offset) packing position:
    docs are shuffled (epoch key), salted into ``n_streams`` streams, and
    packed contiguously into sequences of ``token_budget`` whitespace
    tokens per stream.  A doc belongs to the sequence its FIRST token
    falls in (contiguous greedy packing — the standard pretraining layout
    where sequences are then truncated/joined by the tokenizer).

    Output: (id, n_tokens, stream, seq_id, seq_offset)."""
    k = epoch_key(id_col, seed)
    stream = (F.conv(F.substring(k, 1, 7), 16, 10).cast("long")
              % n_streams).cast("int")
    base = df.select(F.col(id_col).alias("id"),
                     token_count_col(F.col(text_col)).cast("long")
                     .alias("n_tokens"),
                     k.alias("_k"), stream.alias("stream"))
    w = (Window.partitionBy("stream").orderBy("_k")
         .rowsBetween(Window.unboundedPreceding, -1))
    pre = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (base
            .withColumn("seq_id",
                        F.floor(pre / token_budget).cast("long"))
            .withColumn("seq_offset",
                        (pre - F.col("seq_id") * token_budget)
                        .cast("long"))
            .drop("_k"))


def mixture_rates(source_tokens: dict[str, int],
                  target_shares: dict[str, float]) -> dict[str, float]:
    """Per-source keep-rates realizing ``target_shares`` (fractions of the
    OUTPUT token mixture) from ``source_tokens`` (available tokens per
    source) WITHOUT upsampling: the binding source (largest share/tokens
    demand) is kept whole, every other source is downsampled to match.
    Driver-side pure arithmetic on a tiny dict."""
    missing = set(target_shares) - set(source_tokens)
    if missing:
        raise ValueError(f"mixture_rates: no token counts for {missing}")
    empty = [s for s, share in target_shares.items()
             if share > 0 and source_tokens[s] <= 0]
    if empty:
        raise ValueError(
            f"mixture_rates: sources {empty} have a positive target share "
            "but zero available tokens — the target mixture is infeasible")
    # total output tokens T solves max_s(share_s * T / tokens_s) == 1
    t_out = min(source_tokens[s] / share
                for s, share in target_shares.items() if share > 0)
    return {s: min(1.0, (share * t_out) / source_tokens[s])
            if share > 0 else 0.0
            for s, share in target_shares.items()}


def mixture_sample(df: DataFrame, rates: dict[str, float],
                   source_col: str = "source",
                   id_col: str = "doc_id",
                   salt: str = "mixture") -> DataFrame:
    """Deterministic mixture downsampling: keep each row of source s with
    probability rates[s], decided by the md5-keyed U[0,1) draw on
    (salt, id) — stable under repartitioning and re-runs, and the SAME
    doc keeps/drops consistently across epochs.  Unlisted sources drop."""
    u = hash_uniform_col(F.col(id_col), salt=salt + ":")
    rate = None
    for s, r in sorted(rates.items()):
        cond = F.col(source_col) == s
        rate = F.when(cond, F.lit(float(r))) if rate is None \
            else rate.when(cond, F.lit(float(r)))
    rate = rate.otherwise(F.lit(0.0)) if rate is not None else F.lit(0.0)
    return df.filter(u < rate)


def truncate_to_token_budget(df: DataFrame, max_tokens: int,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Per-document token-budget truncation at sentence boundaries: keep
    whole leading sentences while their cumulative whitespace-token count
    fits ``max_tokens`` (always keeping at least the first sentence, so
    no document vanishes) — the context-window guard before packing.

    Output: input ids + (text truncated, n_tokens_kept int,
    was_truncated boolean).

    Scale shape: pure narrow Catalyst — sentence split, per-sentence
    token counts, and the running-sum prefix selection are all per-row
    array expressions (aggregate over the doc's own sentence array); no
    shuffle at all."""
    sents = F.split(F.col(text_col), r"\. ")
    tok_counts = F.transform(
        sents, lambda s: F.size(F.filter(F.split(F.trim(s), r"\s+"),
                                         lambda x: x != "")))
    # ONE linear fold instead of materializing a prefix-sum array (the
    # array-concat formulation copies the accumulator per element — O(s^2)
    # per document): carry (running total, #sentences that fit, tokens in
    # the fitting prefix) through a struct accumulator
    acc0 = F.struct(F.lit(0).alias("total"), F.lit(0).alias("fit"),
                    F.lit(0).alias("kept"))
    folded = F.aggregate(
        tok_counts, acc0,
        lambda acc, n: F.struct(
            (acc["total"] + n).alias("total"),
            (acc["fit"] + F.when(acc["total"] + n <= max_tokens, 1)
             .otherwise(0)).alias("fit"),
            F.when(acc["total"] + n <= max_tokens, acc["total"] + n)
             .otherwise(acc["kept"]).alias("kept")))
    # always keep at least the first sentence so no document vanishes
    n_fit = F.greatest(folded["fit"], F.lit(1))
    n_kept_tokens = F.when(folded["fit"] >= 1, folded["kept"]) \
        .otherwise(F.element_at(tok_counts, 1))
    kept = F.slice(sents, 1, n_fit)
    return df.select(
        F.col(id_col),
        F.array_join(kept, ". ").alias(text_col),
        n_kept_tokens.cast("int").alias("n_tokens_kept"),
        (n_fit < F.size(sents)).alias("was_truncated"))


def chunk_text(df: DataFrame, chunk_tokens: int = 128, overlap: int = 32,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Overlapping token-window chunks per document — the retrieval-ingest
    precursor (each chunk is what gets embedded and indexed).  Windows
    start every ``chunk_tokens - overlap`` tokens and span
    ``chunk_tokens``; the final partial window is kept (never dropped
    content), and an empty document yields no chunks.

    Output: (id, chunk_idx int, start_tok int, n_tokens int, chunk string).

    Distinct from ``operators.chunking`` (which batches ROWS for task
    sizing): this splits each document's own token stream.

    Scale shape: chunk boundaries and slices are per-row array
    expressions over a sequence of window starts — zero shuffle, zero
    data movement; a 100 TB corpus chunks in the scan stage."""
    if overlap >= chunk_tokens:
        raise ValueError("chunk_text: overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                     lambda x: x != "")
    n = F.size(words)
    # window starts: 1, 1+step, ... while start <= max(n - overlap, 1)
    starts = F.when(n > 0, F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(step))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_idx"),
            (s - 1).cast("int").alias("start_tok"),
            F.least(F.lit(chunk_tokens), n - s + 1).cast("int")
             .alias("n_tokens"),
            F.concat_ws(" ", F.slice(words, s, chunk_tokens))
             .alias("chunk")))
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(chunks).alias("c"))
            .select("id", "c.chunk_idx", "c.start_tok", "c.n_tokens",
                    "c.chunk"))
