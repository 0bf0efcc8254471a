"""Corpus term statistics: heavy hitters and TF-IDF top terms.

Training-data curation uses corpus-wide token frequencies (vocabulary
pruning, junk detection) and per-document salient terms (topic tagging,
dedup keys).  Everything here is exact and built-in-only, so each operator
has a DuckDB oracle.

Scale notes:
  * token counting is explode + hash aggregate — map-side partial combine
    means the shuffle carries (token, partial_count), not token instances;
  * heavy hitters' final top-k compiles to TakeOrderedAndProject
    (per-partition top-k + driver merge of k rows — never a global sort);
  * TF-IDF joins the per-token document frequency back through the token
    table; the document count N is a 1-row aggregate (broadcast), and the
    per-doc top-k is a window over doc_id — well-distributed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _norm


def doc_token_counts(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, token, tf): non-distinct token counts per document."""
    return (df
            .select(F.col(id_col).alias("id"),
                    F.explode(F.split(_norm(F.col(text_col)), " "))
                     .alias("token"))
            .filter(F.col("token") != "")
            .groupBy("id", "token")
            .agg(F.count("*").alias("tf")))


def heavy_hitters(df: DataFrame, k: int = 50, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Top-k tokens by corpus frequency (ties broken by token order).
    Output: (token, n_occurrences, n_docs)."""
    counts = (doc_token_counts(df, id_col, text_col)
              .groupBy("token")
              .agg(F.sum("tf").alias("n_occurrences"),
                   F.count("*").alias("n_docs")))
    return counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)


def unigram_logprob_score(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          vocab: DataFrame | None = None,
                          persist_intermediate: bool = True) -> DataFrame:
    """Per-doc mean unigram log-probability — the cheap LM-quality proxy
    (CCNet-style filtering uses a real LM; the unigram model is its exact,
    oracle-able analog): documents full of rare/garbage tokens score low,
    prose built from common vocabulary scores high.  Output:
    (id, n_tokens, avg_logprob), logp(t) = ln((c_t + 1) / (N + V))
    (add-one smoothed; OOV tokens get c_t = 0).

    ``vocab``: (token, c) counts to score against — pass the TRAIN corpus
    vocabulary to score held-out or incoming docs; default scores the
    corpus against itself.  The vocabulary broadcasts (same skew argument
    as ``tfidf_top_terms``: the join key is power-law distributed, the
    (token, count) table is orders of magnitude smaller than the corpus).

    In self-scoring mode the corpus token table feeds BOTH the vocabulary
    aggregate and the scoring join, so it is persisted
    (``persist_intermediate``; release the handle via
    ``datapipe.cache.release_cached(result)``) instead of tokenizing the
    corpus twice; with an external ``vocab`` it has one consumer and no
    cut is taken.
    """
    tf = doc_token_counts(df, id_col, text_col)
    cached = []
    if vocab is None:
        if persist_intermediate:
            from pyspark import StorageLevel
            tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
            cached = [tf]
        vocab = tf.groupBy("token").agg(F.sum("tf").alias("c"))
    stats = vocab.agg(F.sum("c").alias("_n"), F.count("*").alias("_v"))
    logp = F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                 / (F.col("_n") + F.col("_v")))
    # the per-term contribution tf*logp is a double; summing doubles is
    # partial-sum-order dependent, so accumulate in exact decimal (the
    # per-row cast is deterministic, decimal addition associative) and do
    # ONE double division at the end — the score is then invariant to
    # partitioning, and the DuckDB oracle mirrors the identical casts
    out = (tf.join(F.broadcast(vocab), "token", "left")
           .crossJoin(F.broadcast(stats))
           .groupBy("id")
           .agg(F.sum("tf").cast("long").alias("n_tokens"),
                F.round(F.sum((F.col("tf") * logp).cast("decimal(20,8)"))
                         .cast("double") / F.sum("tf"), 6)
                 .alias("avg_logprob")))
    from .cache import attach_cached_deps
    return attach_cached_deps(out, *cached)


def tfidf_top_terms(df: DataFrame, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text",
                    broadcast_dfreq: bool = True) -> DataFrame:
    """Top-k terms per document by TF-IDF, idf = ln((N + 1) / (df + 1))
    (smoothed; N = corpus document count).  Output:
    (id, token, tfidf double, rank) with deterministic tie-breaks
    (higher tfidf, then token order).

    Skew note: ``token`` is a power-law key — every document hits the
    stopwords, so a shuffle join of tf-to-dfreq piles those keys onto a few
    reducers.  The document-frequency table is only (token, df) pairs —
    vocabulary-sized, orders of magnitude smaller than the corpus — so the
    default broadcasts it and the tf side never shuffles for the join.  Set
    ``broadcast_dfreq=False`` only when the vocabulary genuinely exceeds
    executor memory (e.g. unfiltered n-gram vocabularies); that path leans
    on AQE skew-join splitting."""
    tf = doc_token_counts(df, id_col, text_col)
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    if broadcast_dfreq:
        dfreq = F.broadcast(dfreq)
    n = df.select(F.count("*").alias("n_docs"))
    scored = (tf.join(dfreq, "token")
              .crossJoin(F.broadcast(n))
              .withColumn(
                  "tfidf",
                  (F.col("tf") * F.log((F.col("n_docs") + 1)
                                       / (F.col("df") + 1))).cast("double")))
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id", "token", F.round("tfidf", 6).alias("tfidf"),
                    "rank"))


def bigram_pmi(df: DataFrame, k: int = 50, min_count: int = 3,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k adjacent-token bigrams by pointwise mutual information:
    PMI(x,y) = ln(c(xy) * T / (c(x) * c(y))), T = total token count.
    The collocation detector ("new york", "machine learning") every
    tokenizer/phrase-mining pass runs over a fresh corpus.

    Scale shape: bigrams come from zip_with over each doc's own token
    array — a NARROW per-row expression, never a self-join; the only
    shuffles are the two count aggregates (unigrams, bigrams), both with
    map-side combine.  ``min_count`` prunes the bigram tail before the
    unigram join; the unigram count frame broadcasts (vocabulary-sized).
    PMI derives from integer counts only — deterministic at any
    partitioning; ln cross-engine equality is pinned by the gate.

    Output: (tok_x, tok_y, n_pair, pmi) — ties broken by token order."""
    from .dedup import _norm
    words = F.filter(F.split(_norm(F.col(text_col)), " "),
                     lambda x: x != "")
    toks = (df.select(F.explode(words).alias("token"))
            .groupBy("token").agg(F.count("*").alias("c")))
    pairs_arr = F.when(
        F.size(words) >= 2,
        F.zip_with(F.slice(words, 1, F.size(words) - 1),
                   F.slice(words, 2, F.size(words) - 1),
                   lambda a, b: F.struct(a.alias("x"), b.alias("y")))
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
    pairs = (df.select(F.explode(pairs_arr).alias("p"))
             .select(F.col("p.x").alias("tok_x"),
                     F.col("p.y").alias("tok_y"))
             .groupBy("tok_x", "tok_y")
             .agg(F.count("*").alias("n_pair"))
             .filter(F.col("n_pair") >= min_count))
    total = toks.agg(F.sum("c").alias("_t"))
    ux = toks.select(F.col("token").alias("tok_x"), F.col("c").alias("_cx"))
    uy = toks.select(F.col("token").alias("tok_y"), F.col("c").alias("_cy"))
    scored = (pairs.join(F.broadcast(ux), "tok_x")
              .join(F.broadcast(uy), "tok_y")
              .crossJoin(F.broadcast(total))
              .select("tok_x", "tok_y", "n_pair",
                      F.round(F.log(F.col("n_pair") * F.col("_t")
                                    / (F.col("_cx") * F.col("_cy"))), 6)
                       .alias("pmi")))
    return (scored.orderBy(F.desc("pmi"), F.asc("tok_x"), F.asc("tok_y"))
            .limit(k))


def bpe_pair_counts(df: DataFrame, k: int = 50,
                    text_col: str = "text") -> DataFrame:
    """The first BPE merge round: corpus-wide counts of adjacent SYMBOL
    pairs inside words (symbols = characters before any merge).  A real
    tokenizer-training loop repeats this count-and-merge; one exact round
    is the oracle-able Spark kernel it iterates.

    Scale shape: words and their character pairs are narrow per-row array
    expressions (split + zip_with) — the corpus never shuffles until the
    final pair-count aggregate with map-side combine.  Counts are
    integers — partition-invariant by construction.

    Output: top-k (sym_a, sym_b, n) by count, ties by symbol order."""
    from .dedup import _norm
    words = F.filter(F.split(_norm(F.col(text_col)), " "),
                     lambda x: x != "")
    chars = lambda w: F.split(w, "")  # noqa: E731
    pair_arrays = F.flatten(F.transform(words, lambda w: F.when(
        F.length(w) >= 2,
        F.zip_with(F.slice(chars(w), 1, F.length(w) - 1),
                   F.slice(chars(w), 2, F.length(w) - 1),
                   lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))))
    return (df.select(F.explode(pair_arrays).alias("p"))
            .select(F.col("p.a").alias("sym_a"), F.col("p.b").alias("sym_b"))
            .groupBy("sym_a", "sym_b")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("sym_a"), F.asc("sym_b"))
            .limit(k))


def bigram_logprob_score(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Per-doc mean bigram conditional log-probability under the corpus's
    own bigram model — the next rung above ``unigram_logprob_score`` on
    the LM-quality ladder (word-salad scores low even when every single
    token is common, because its TRANSITIONS are rare):

      score(d) = (1/B) * sum over adjacent pairs (x, y) of
                 ln((c(xy) + 1) / (c(x) + V)),  V = unigram vocab size.

    Output: (id, n_bigrams, avg_logprob) — single-token and empty docs
    are excluded (no transitions to score).

    Scale shape: pairing is a narrow zip_with (never a self-join); the
    bigram/unigram count tables aggregate with map-side combine and the
    count frames broadcast into the scoring join (vocabulary-sized).
    Per-pair contributions accumulate in DECIMAL, so the score is
    partition-invariant (ARCHITECTURE §6), and every term derives from
    integer counts + one ln — exactly SQL-mirrorable for the r6 gate.
    """
    from .dedup import _norm
    words = F.filter(F.split(_norm(F.col(text_col)), " "),
                     lambda x: x != "")
    pairs_arr = F.when(
        F.size(words) >= 2,
        F.zip_with(F.slice(words, 1, F.size(words) - 1),
                   F.slice(words, 2, F.size(words) - 1),
                   lambda a, b: F.struct(a.alias("x"), b.alias("y")))
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
    doc_pairs = (df.select(F.col(id_col).alias("id"),
                           F.explode(pairs_arr).alias("p"))
                 .select("id", F.col("p.x").alias("x"),
                         F.col("p.y").alias("y"))
                 .groupBy("id", "x", "y")
                 .agg(F.count("*").alias("n")))
    uni = (df.select(F.explode(words).alias("x"))
           .groupBy("x").agg(F.count("*").alias("cx")))
    big = doc_pairs.groupBy("x", "y").agg(F.sum("n").alias("cxy"))
    vocab = uni.agg(F.count("*").alias("_v"))
    logp = F.log((F.col("cxy") + 1.0) / (F.col("cx") + F.col("_v")))
    return (doc_pairs
            .join(F.broadcast(big), ["x", "y"])
            .join(F.broadcast(uni), "x")
            .crossJoin(F.broadcast(vocab))
            .groupBy("id")
            .agg(F.sum("n").cast("long").alias("n_bigrams"),
                 F.round(F.sum((F.col("n") * logp).cast("decimal(20,8)"))
                          .cast("double") / F.sum("n"), 6)
                  .alias("avg_logprob")))


def zipf_slope(df: DataFrame, k: int = 200, text_col: str = "text",
               min_count: int = 1) -> DataFrame:
    """Zipf rank-frequency slope over the top-k vocabulary: the OLS slope
    of ln(freq) on ln(rank).  Natural language sits near -1; a corpus
    drifting toward -0.5 (flat: templated/boilerplate soup) or -2
    (head-heavy: repeated spam) fails the pre-training smell test — this
    is the one-number vocabulary-health monitor.

    Output: one row (n_terms, slope, intercept), both coefficients
    rounded to 6dp.

    Scale shape: the corpus reduces to (token, count) via one map-side-
    combinable aggregate; top-k compiles to TakeOrderedAndProject (never
    a global sort); ranking and the OLS sums run on k rows.  The ln()
    terms are rounded to 12dp and accumulated in DECIMAL so the k-row
    sums are order-invariant (the float-agg determinism rule) — the
    DuckDB oracle mirrors the same rounding and accumulation exactly.
    """
    counts = (df
              .select(F.explode(F.filter(
                  F.split(_norm(F.col(text_col)), " "),
                  lambda x: x != "")).alias("token"))
              .groupBy("token").agg(F.count("*").alias("c"))
              .filter(F.col("c") >= min_count))
    topk = counts.orderBy(F.col("c").desc(), "token").limit(k)
    ranked = topk.select(
        F.row_number().over(
            Window.orderBy(F.col("c").desc(), "token")).alias("rank"),
        "c")
    # products are taken in double and re-rounded to 12dp BEFORE the
    # decimal cast: decimal x decimal at scale 12 exceeds precision 38
    # and Spark/DuckDB reduce the scale differently — double multiply of
    # identical rounded doubles is IEEE-identical on both engines
    lx = F.round(F.log(F.col("rank").cast("double")), 12)
    ly = F.round(F.log(F.col("c").cast("double")), 12)
    dec = "decimal(28,12)"
    sums = ranked.agg(
        F.count("*").cast("bigint").alias("n_terms"),
        F.sum(lx.cast(dec)).alias("sx"),
        F.sum(ly.cast(dec)).alias("sy"),
        F.sum(F.round(lx * ly, 12).cast(dec)).alias("sxy"),
        F.sum(F.round(lx * lx, 12).cast(dec)).alias("sxx"))
    n = F.col("n_terms").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        "n_terms",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"))


def rake_phrases(df: DataFrame, k: int = 3, max_phrase_len: int = 4,
                 id_col: str = "doc_id", text_col: str = "text",
                 stopwords: tuple[str, ...] | None = None) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): per-document top-k
    multi-word candidate phrases.  Candidates are maximal runs of
    content tokens between boundaries (stopwords, or any token that is
    not purely a-z); each content word w gets score deg(w)/freq(w)
    within its document (deg = summed length of the phrases containing
    each occurrence, freq = occurrence count — frequent-but-isolated
    words score ~1, words living in long phrases score higher) and a
    phrase scores the sum of its members' scores.  Phrases longer than
    ``max_phrase_len`` are dropped (the classic runaway guard for
    listy/boilerplate text).

    Output: (id, phrase, n_words, score) — top-k per doc by
    (score desc, phrase asc).

    Scale shape: tokenization + boundary flags are narrow; islands come
    from ONE running-sum window over (id, pos) and every later
    aggregate/join is keyed by (id, ...) — well-distributed, no
    broadcast needed because word stats are PER-DOCUMENT (RAKE's
    defining trait vs tfidf's corpus dfreq).  The top-k is a per-id
    window on a frame already reduced to phrases.  Determinism:
    deg/freq are integers; each ratio is rounded to 12 dp, phrase
    scores accumulate in DECIMAL, one final 6-dp round (ARCHITECTURE
    §6)."""
    from .dedup import _norm
    if stopwords is None:
        from .textstats import STOPWORDS
        stopwords = STOPWORDS
    words = F.filter(F.split(_norm(F.col(text_col)), " "),
                     lambda x: x != "")
    toks = (df.select(F.col(id_col).alias("id"),
                      F.posexplode(words).alias("pos", "token"))
            .withColumn("is_boundary",
                        F.col("token").isin(*stopwords)
                        | ~F.col("token").rlike("^[a-z]+$")))
    w = Window.partitionBy("id").orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = toks.withColumn("island",
                           F.sum(F.col("is_boundary").cast("int")).over(w)) \
        .filter(~F.col("is_boundary"))
    phrases = (runs.groupBy("id", "island")
               .agg(F.transform(
                       F.sort_array(F.collect_list(
                           F.struct(F.col("pos").alias("p"),
                                    F.col("token").alias("t")))),
                       lambda s: s["t"]).alias("toks"))
               .withColumn("n_words", F.size("toks"))
               .filter(F.col("n_words") <= max_phrase_len))
    members = phrases.select("id", "island", "n_words",
                             F.explode("toks").alias("token"))
    wstats = (members.groupBy("id", "token")
              .agg(F.count("*").alias("freq"),
                   F.sum("n_words").alias("deg"))
              .withColumn("ratio", F.round(
                  F.col("deg").cast("double") / F.col("freq"), 12)))
    scored = (members.join(wstats, ["id", "token"])
              .groupBy("id", "island")
              .agg(F.any_value(F.col("n_words")).alias("n_words"),
                   F.round(F.sum(F.col("ratio").cast("decimal(24,12)"))
                           .cast("double"), 6).alias("score"))
              .join(phrases.select("id", "island",
                                   F.array_join("toks", " ")
                                   .alias("phrase")),
                    ["id", "island"])
              # a phrase repeated in one doc yields identical
              # (phrase, score) rows per occurrence (same member
              # ratios); RAKE scores each UNIQUE phrase once — and the
              # dedup is what keeps the top-k rank deterministic
              .groupBy("id", "phrase")
              .agg(F.max("n_words").alias("n_words"),
                   F.max("score").alias("score")))
    topw = Window.partitionBy("id").orderBy(F.desc("score"),
                                            F.asc("phrase"))
    return (scored.withColumn("rank", F.row_number().over(topw))
            .filter(F.col("rank") <= k)
            .select("id", "phrase",
                    F.col("n_words").cast("int").alias("n_words"),
                    "score", F.col("rank").cast("int").alias("rank")))
