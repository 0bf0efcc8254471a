"""Deduplication operators for large-scale training-data pipelines.

All operators are expressed with built-in DataFrame ops so Catalyst handles
pushdown/pruning, and all hashing is md5/sha2-based (not Spark's internal
``hash``) so results are engine-independent and every step has an exact
DuckDB SQL oracle.

Scale notes (100 TB):
  * exact dedup: one hash-aggregate on the normalized text digest — map-side
    partial agg makes this shuffle-light; group key is a 128-bit digest, no
    skew beyond true duplicates.
  * MinHash+LSH: signatures are per-row (narrow); the only shuffle is the
    band-bucket self-join.  Banding bounds candidate pairs; the join key
    (band_idx, band_hash) is high-cardinality.  The classic guard against a
    degenerate bucket (e.g. empty docs) is a bucket-size cap — applied here
    as a count filter before the pair join.
  * n-gram Jaccard: at scale, always candidate-driven — the token table is
    joined through LSH candidate pairs, so the quadratic token self-join
    never forms (LSH proposes, exact Jaccard disposes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one shared text normalization for dedup (mirrors F7 but keeps word chars)
def _norm(col):
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text with
    the canonical (min) id and the duplicate count."""
    return (df
            .select(F.col(id_col).alias("id"),
                    F.md5(_norm(F.col(text_col))).alias("digest"))
            .groupBy("digest")
            .agg(F.min("id").alias("canonical_id"),
                 F.count("*").alias("n_dups")))


def tokens(df: DataFrame, id_col: str = "doc_id",
           text_col: str = "text") -> DataFrame:
    """(id, token) distinct word tokens of the normalized text.

    Distinctness is per ROW (``array_distinct`` before the explode — a
    narrow expression) instead of a corpus-wide distinct exchange; with
    the module's standard ONE-row-per-id input contract the two are
    identical.  Pre-aggregate text per id first if ids can repeat."""
    return (df
            .select(F.col(id_col).alias("id"),
                    F.explode(F.array_distinct(F.filter(
                        F.split(_norm(F.col(text_col)), " "),
                        lambda t: t != ""))).alias("token")))


def shingles(df: DataFrame, k: int = 3, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(id, shingle): distinct k-word shingles (k-grams) of the text.

    Per-row ``array_distinct`` replaces the old corpus-wide distinct
    exchange (identical output under the module's ONE-row-per-id input
    contract; pre-aggregate text per id first if ids can repeat)."""
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(F.array_distinct(
                          _shingle_array(k, text_col))).alias("shingle")))


def _shingle_array(k: int, text_col: str):
    """Column expr: the k-word shingle array of the normalized text (may
    contain duplicates — harmless for min-based signatures)."""
    words = F.split(_norm(F.col(text_col)), " ")
    n = F.size(words)
    return F.when(
        n >= k,
        F.transform(F.sequence(F.lit(1), n - k + 1),
                    lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    ).otherwise(F.array(F.concat_ws(" ", words)))


def _signature_array(k: int, n_hashes: int, text_col: str):
    """Column expr: array of n_hashes minhashes, index = seed.  min over a
    multiset equals min over its distinct set, so no dedup is needed and the
    whole signature is ONE narrow per-row expression — no explode, no
    shuffle (the classic explode+groupBy formulation ships n_hashes x
    shingles rows through an exchange; this ships zero)."""
    sh = _shingle_array(k, text_col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda s: F.array_min(F.transform(
            sh, lambda x: F.md5(F.concat(s.cast("string"), F.lit(":"), x)))))


def _signature_frame(df: DataFrame, n_hashes: int, k: int,
                     id_col: str, text_col: str) -> DataFrame:
    """(id, sig array<string>) via an Arrow-batched kernel (mapInArrow) —
    the EXACT hash family of ``_signature_array``, computed in
    hashlib/Python instead of interpreted Catalyst HOFs.

    Why: the expression form evaluates md5 through nested
    transform/array_min lambdas — measured ~50 CPU-seconds per evaluation
    at sf0.1 (the single largest CPU sink of the curation pipeline);
    hashlib on pre-encoded shingle bytes is ~10x cheaper, and min over
    the DISTINCT shingle set (min over a multiset equals min over its
    set) cuts duplicate hashing too.  Guide §4.2: ship only (id, text),
    batch via Arrow, no per-row Python UDF.

    Exactness contract (each step mirrors the Catalyst twin, which stays
    in ``_signature_array`` as the oracle-documented form):
      * trim  = leading/trailing SPACE only  -> str.strip(' ')
      * \\s+  = Java ASCII class [ \\t\\n\\x0B\\f\\r] -> re.ASCII \\s+
      * lower AFTER the collapse; split(' ') keeps empty tokens
      * null/short text -> the [normalized-text] singleton ([''] for
        null/empty, matching concat_ws's null-skip)
      * md5 of 'seed:shingle' UTF-8 bytes, lowercase hex, lexicographic
        min — engine-independent, so the DuckDB oracles are untouched.
    Parity is pinned by the merge_shards cross-engine fuzz
    (unicode/whitespace adversarial docs) and every minhash gate oracle.
    Input contract: ONE row per id (as ``minhash_signatures``)."""
    id_dt = df.schema[id_col].dataType.simpleString()

    def batches(it):
        import hashlib
        import re

        import pyarrow as pa
        ws = re.compile(r"\s+", re.ASCII)
        md5 = hashlib.md5
        prefixes = [f"{s}:".encode() for s in range(n_hashes)]
        for rb in it:
            sigs = []
            for t in rb.column(1).to_pylist():
                if t is None:
                    shb = [b""]
                else:
                    norm = ws.sub(" ", t.strip(" ")).lower()
                    words = norm.split(" ")
                    if len(words) >= k:
                        shb = [s.encode() for s in
                               {" ".join(words[i:i + k])
                                for i in range(len(words) - k + 1)}]
                    else:
                        shb = [norm.encode()]
                sigs.append([min(md5(p + b).hexdigest() for b in shb)
                             for p in prefixes])
            yield pa.RecordBatch.from_arrays(
                [rb.column(0),
                 pa.array(sigs, type=pa.list_(pa.string()))],
                names=["id", "sig"])

    return df.select(F.col(id_col).alias("id"), F.col(text_col)) \
        .mapInArrow(batches, schema=f"id {id_dt}, sig array<string>")


def minhash_signatures(df: DataFrame, n_hashes: int = 16, k: int = 3,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """MinHash signature per doc: for seed s, min over shingles of
    md5(s || shingle) (lexicographic min of the hex digest — deterministic
    and portable to any SQL engine).  Output: (id, seed, minhash).

    Computed entirely row-wise (narrow): the only non-map operator in the
    plan is the final posexplode, which is also narrow — at 100 TB this
    stage shuffles NOTHING (it used to be an explode + groupBy exchange).

    Input contract: ONE row per id.  The per-row form signs each row
    independently — an id spanning multiple rows yields one (possibly
    conflicting) signature per row, where the old explode+groupBy form
    pooled shingles across rows.  Pre-aggregate text per id (e.g.
    concat_ws over collect_list) before calling if ids can repeat.

    Stays the pure-Catalyst expression form: the Arrow kernel
    (``_signature_frame``) pays a fixed Python-stage cost that LOSES on
    the small frames these entry points serve (measured +0.3-0.6 s on
    merge_shards / minhash_sig at sf0.1) and only wins where the
    signature work dominates (``minhash_band_buckets``'s consumers).
    """
    return (df.select(F.col(id_col).alias("id"),
                      _signature_array(k, n_hashes, text_col).alias("_sig"))
            .select("id",
                    F.posexplode("_sig").alias("seed", "minhash")))


def signature_table(df: DataFrame, n_hashes: int = 16, k: int = 3,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Array-form MinHash signature per doc: (id, sig array<string>) —
    the shape ``merge_signature_shards`` consumes and the sharded-ingest
    index stores.  Same hashes as ``minhash_signatures`` (which is the
    posexploded view of this), same zero-shuffle narrow plan (and the
    same small-frame reasoning for staying in expression form)."""
    return df.select(F.col(id_col).alias("id"),
                     _signature_array(k, n_hashes, text_col).alias("sig"))


def minhash_bands(signatures: DataFrame, rows_per_band: int = 4) -> DataFrame:
    """LSH banding from an exploded (id, seed, minhash) signature frame:
    band_hash = md5 of the concatenated minhashes of the band.
    Output: (id, band_idx, band_hash).

    This form shuffles on (id, band_idx); when you control the upstream,
    prefer ``minhash_band_buckets`` which computes the same hashes with NO
    shuffle at all."""
    return (signatures
            .withColumn("band_idx",
                        F.floor(F.col("seed") / rows_per_band).cast("int"))
            .groupBy("id", "band_idx")
            .agg(F.md5(F.concat_ws("|", F.sort_array(
                F.collect_list(F.concat_ws(":", F.col("seed").cast("string"),
                                           F.col("minhash"))))))
                 .alias("band_hash")))


def minhash_band_buckets(df: DataFrame, n_hashes: int = 16,
                         rows_per_band: int = 4, k: int = 3,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Fused narrow MinHash-LSH bucketing: text -> (id, band_idx, band_hash)
    with ZERO shuffle — signature and band hashes are per-row array
    expressions, the final posexplode is narrow.  Byte-identical hashes to
    ``minhash_bands(minhash_signatures(...))`` (same "seed:minhash" strings,
    same sort, same md5 — the classic formulation is kept as the oracle).

    At 100 TB this makes the whole candidate-generation pipeline one map
    stage followed by a single bucket-join shuffle.

    Input contract: ONE row per id (same as ``minhash_signatures`` — the
    per-row form cannot pool shingles across rows of a repeated id)."""
    n_bands = n_hashes // rows_per_band
    with_sig = _signature_frame(df, n_hashes, k, id_col, text_col) \
        .withColumnRenamed("sig", "_sig")
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.md5(F.concat_ws("|", F.array_sort(F.transform(
            F.sequence(b * rows_per_band, (b + 1) * rows_per_band - 1),
            lambda s: F.concat_ws(":", s.cast("string"),
                                  F.get(F.col("_sig"), s)))))))
    return (with_sig
            .select("id", F.posexplode(bands).alias("band_idx", "band_hash"))
            .withColumn("band_idx", F.col("band_idx").cast("int")))


def minhash_candidate_pairs(bands: DataFrame,
                            max_bucket: int = 1000,
                            persist_intermediate: bool = True) -> DataFrame:
    """Docs sharing any LSH band bucket -> candidate near-dup pairs (id_a <
    id_b).  Buckets larger than ``max_bucket`` are dropped (degenerate-text
    guard: at web scale a single junk bucket would otherwise emit
    O(n^2) pairs).

    ``persist_intermediate``: the band frame feeds THREE consumers (the
    bucket-size aggregate and both sides of the pair join) — without a cut
    Catalyst inlines the whole upstream signature computation per consumer,
    tripling the most expensive narrow scan of the pipeline (this was the
    bulk of the r3 curation first-run outlier).  The persisted frame is
    only (id, band_idx, band_hash); on a cluster the same cut is a
    checkpoint."""
    cached = []
    if persist_intermediate:
        from pyspark import StorageLevel
        bands = bands.persist(StorageLevel.MEMORY_AND_DISK)
        cached = [bands]
    sized = (bands.groupBy("band_idx", "band_hash")
             .agg(F.count("*").alias("sz"))
             .filter((F.col("sz") > 1) & (F.col("sz") <= max_bucket)))
    b = bands.join(sized.select("band_idx", "band_hash"),
                   ["band_idx", "band_hash"])
    a = b.select("band_idx", "band_hash", F.col("id").alias("id_a"))
    c = b.select("band_idx", "band_hash", F.col("id").alias("id_b"))
    out = (a.join(c, ["band_idx", "band_hash"])
           .filter(F.col("id_a") < F.col("id_b"))
           .select("id_a", "id_b").distinct())
    from .cache import attach_cached_deps
    return attach_cached_deps(out, *cached)


def connected_components(pairs: DataFrame, max_iter: int = 25,
                         nodes: DataFrame | None = None,
                         strict: bool = True) -> DataFrame:
    """Connected components over a near-duplicate pair graph:
    (id_a, id_b) edges -> (id, component) where ``component`` is the
    smallest id reachable from ``id``.  This is the transitive-closure
    survivor policy: keep one doc per component (the min id), instead of
    the greedy "drop any id_b" rule that over-drops chains (see
    ``curate.curate_corpus``'s policy note).

    Algorithm: min-label propagation — every node starts labeled with its
    own id; each round every node takes the min of its label and its
    neighbors' labels; converged when no label changes.  Rounds needed =
    graph diameter (near-dup clusters are small and dense, so typically
    2-4).  Each round is one shuffle join + one aggregate; the label frame
    is localCheckpoint'ed per round to cut the growing lineage (iterative
    plans otherwise re-execute from the source every round).  The per-round
    convergence test is ONE driver-side count — the canonical coordination
    pattern for iterative graph algorithms (GraphX/Pregel do the same);
    nothing row-sized ever reaches the driver.  At web scale the same loop
    runs with a DFS checkpoint instead of localCheckpoint, and the
    large-star/small-star variant (Kiveris et al., "Connected Components
    in MapReduce and Beyond") bounds rounds to O(log^2 n) on adversarial
    diameters — near-dup graphs never need it.

    ``nodes``: optional (id) frame; ids not in any pair then appear as
    their own singleton component (default: nodes = ids seen in pairs).

    ``strict``: labels still changing after ``max_iter`` rounds (graph
    diameter exceeded the budget) raise RuntimeError rather than silently
    returning a partial clustering — a survivor policy computed from
    unconverged labels would keep extra "survivors" with no signal.  Pass
    ``strict=False`` to accept the partial result knowingly.
    """
    edges = (pairs.select(F.col("id_a").alias("src"),
                          F.col("id_b").alias("dst"))
             .union(pairs.select(F.col("id_b").alias("src"),
                                 F.col("id_a").alias("dst")))
             .distinct())
    edges = edges.persist()
    if nodes is None:
        nodes = edges.select(F.col("src").alias("id")).distinct()
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("id")).distinct()
    labels = nodes.select("id", F.col("id").alias("component"))
    labels = labels.localCheckpoint()
    changed = 0
    for _ in range(max_iter):
        # neighbor messages: each edge ships its dst's current label to src
        msgs = (edges.join(labels.withColumnRenamed("id", "dst"), "dst")
                .select(F.col("src").alias("id"), "component"))
        new_labels = (labels.union(msgs)
                      .groupBy("id")
                      .agg(F.min("component").alias("component")))
        new_labels = new_labels.localCheckpoint()
        # convergence: any node whose label shrank this round?
        changed = (labels.withColumnRenamed("component", "old")
                   .join(new_labels, "id")
                   .filter(F.col("component") < F.col("old"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if strict and changed != 0:
        raise RuntimeError(
            f"connected_components: labels still changing after "
            f"{max_iter} rounds (graph diameter exceeds the budget); "
            "raise max_iter, or pass strict=False to accept the partial "
            "clustering")
    return labels


def duplicate_clusters(df: DataFrame, threshold: float = 0.8,
                       n_hashes: int = 8, rows_per_band: int = 2,
                       k: int = 3, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """End-to-end transitive near-dup clustering: MinHash-LSH proposes
    candidate pairs, exact Jaccard >= ``threshold`` disposes, connected
    components merge the surviving pairs into clusters.  Output:
    (id, component) for every doc that belongs to a multi-doc cluster,
    component = min doc id of the cluster — the set to deduplicate against
    (keep each component's min id, drop the rest)."""
    cand = minhash_candidate_pairs(
        minhash_band_buckets(df, n_hashes=n_hashes,
                             rows_per_band=rows_per_band, k=k,
                             id_col=id_col, text_col=text_col))
    similar = (jaccard_pairs(df, candidates=cand, k=k, id_col=id_col,
                             text_col=text_col)
               .filter(F.col("jaccard") >= threshold)
               .select("id_a", "id_b"))
    return connected_components(similar)


def jaccard_pairs(df: DataFrame, candidates: DataFrame | None = None,
                  k: int = 1, id_col: str = "doc_id",
                  text_col: str = "text",
                  persist_intermediate: bool = True,
                  _raw_overlap: bool = False) -> DataFrame:
    """Exact n-gram Jaccard similarity.  Output: (id_a, id_b, jaccard double).

    With ``candidates`` (id_a, id_b — e.g. from ``minhash_candidate_pairs``)
    the token table is joined THROUGH the candidate pair frame, so the
    quadratic token self-join never forms: the intersection aggregate's input
    is exactly the candidate pairs' tokens.  This is the 100-TB path —
    LSH proposes, exact Jaccard disposes.

    Without candidates the all-pairs token self-join runs — only sane on
    small or pre-blocked inputs (the candidate path is the scale default;
    callers on raw corpora should always pass LSH candidates).

    ``persist_intermediate``: the token table feeds three consumers (both
    join sides + the size agg) and the candidate frame two — Catalyst
    inlines common subplans per consumer, so without a persist the shingle
    explode (and the caller's whole LSH pipeline under ``candidates``)
    recomputes per branch.  On a cluster the equivalent cut is a checkpoint
    of the two small frames.
    """
    from pyspark import StorageLevel

    from .cache import attach_cached_deps
    cached = []
    if candidates is not None:
        # fold in any caches the candidate pipeline itself persisted
        cached.extend(getattr(candidates, "_cached_deps", []))
        cand = candidates.select("id_a", "id_b")
        if persist_intermediate:
            cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
            cached.append(cand)
        ids = (cand.select(F.col("id_a").alias("id"))
               .union(cand.select("id_b")).distinct())
        # prune the DOCUMENT frame to candidate members BEFORE the shingle
        # compute: Catalyst cannot push a semi-join below a Generate, so
        # pruning an exploded token table still shingled the whole corpus
        # (this prune + the array form below: curation's jaccard stage
        # 10.0s -> 5.6s at sf0.1; at 100 TB the difference is shingling
        # the corpus vs shingling the candidates).  AQE picks broadcast
        # when the bucket-capped candidate set is small — unforced, so a
        # pathological candidate explosion degrades to a shuffle join
        # instead of a driver OOM.
        df = df.join(ids.select(F.col("id").alias(id_col)),
                     id_col, "left_semi")
        # candidate path: per-doc DISTINCT-shingle ARRAYS + one
        # array_intersect per pair — two equi-joins, zero aggregates,
        # identical integer counts to the exploded token-table form (same
        # distinct shingles, same inner-join drop of token-less docs).
        # Strictly less shuffle at scale: (id, array) rows move once per
        # join side vs every (id, shingle) row moving twice + a pair
        # groupBy.
        if k > 1:
            arr = F.array_distinct(_shingle_array(k, text_col))
        else:
            arr = F.array_distinct(F.filter(
                F.split(_norm(F.col(text_col)), " "),
                lambda t: t != ""))
        arrs = (df.select(F.col(id_col).alias("id"), arr.alias("sh"))
                .filter(F.size("sh") > 0))
        if persist_intermediate:
            arrs = arrs.persist(StorageLevel.MEMORY_AND_DISK)
            cached.append(arrs)
        overlap = (cand
                   .join(arrs.select(F.col("id").alias("id_a"),
                                     F.col("sh").alias("_sh_a")), "id_a")
                   .join(arrs.select(F.col("id").alias("id_b"),
                                     F.col("sh").alias("_sh_b")), "id_b")
                   .select("id_a", "id_b",
                           F.size(F.array_intersect("_sh_a", "_sh_b"))
                            .cast("long").alias("n_inter"),
                           F.size("_sh_a").cast("long").alias("sz_a"),
                           F.size("_sh_b").cast("long").alias("sz_b")))
    else:
        toks = shingles(df, k=k, id_col=id_col, text_col=text_col) \
            if k > 1 \
            else tokens(df, id_col=id_col,
                        text_col=text_col).withColumnRenamed(
                "token", "shingle")
        if persist_intermediate:
            toks = toks.persist(StorageLevel.MEMORY_AND_DISK)
            cached.append(toks)
        ta = toks.select(F.col("id").alias("id_a"), "shingle")
        tb = toks.select(F.col("id").alias("id_b"), "shingle")
        inter = (ta.join(tb, "shingle")
                 .filter(F.col("id_a") < F.col("id_b"))
                 .groupBy("id_a", "id_b")
                 .agg(F.count("*").alias("n_inter")))
        sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))
        overlap = (inter
                   .join(sizes.select(F.col("id").alias("id_a"),
                                      F.col("sz").alias("sz_a")), "id_a")
                   .join(sizes.select(F.col("id").alias("id_b"),
                                      F.col("sz").alias("sz_b")), "id_b"))
    if _raw_overlap:   # (id_a, id_b, n_inter, sz_a, sz_b) for containment
        return attach_cached_deps(overlap, *cached)
    out = overlap.select(
        "id_a", "id_b",
        (F.col("n_inter")
         / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")))
        .cast("double").alias("jaccard"))
    return attach_cached_deps(out, *cached)


def containment_pairs(df: DataFrame, candidates: DataFrame | None = None,
                      k: int = 3, id_col: str = "doc_id",
                      text_col: str = "text",
                      persist_intermediate: bool = True) -> DataFrame:
    """Shingle CONTAINMENT per pair: c_a = |S(A)∩S(B)| / |S(A)| (how much
    of A lives inside B) and symmetrically c_b.  Jaccard under-scores
    sub-document duplication — a page embedded verbatim in a 100x larger
    doc has tiny Jaccard but c_a ≈ 1 — so curation pipelines screen on
    containment to catch quote-farms and wrapper pages.

    Output: (id_a, id_b, n_inter, containment_a, containment_b).  Same
    scale story as ``jaccard_pairs``: pass LSH ``candidates`` so the
    shingle self-join never forms (LSH proposes, containment disposes);
    all ratios derive from integer counts — deterministic at any
    partitioning."""
    base = jaccard_pairs(df, candidates=candidates, k=k, id_col=id_col,
                         text_col=text_col,
                         persist_intermediate=persist_intermediate,
                         _raw_overlap=True)
    out = base.select(
        "id_a", "id_b", "n_inter",
        F.round((F.col("n_inter") / F.col("sz_a")).cast("double"), 6)
         .alias("containment_a"),
        F.round((F.col("n_inter") / F.col("sz_b")).cast("double"), 6)
         .alias("containment_b"))
    # the select returns a fresh frame — re-attach the persisted handles
    # jaccard_pairs hung on `base` or they become unreleasable
    from .cache import attach_cached_deps
    return attach_cached_deps(out, base)


def ngram_overlap(train: DataFrame, test: DataFrame, n: int = 13,
                  id_col: str = "doc_id", text_col: str = "text",
                  max_train_df: int = 1000,
                  persist_intermediate: bool = True) -> DataFrame:
    """Benchmark decontamination probe: (test_id, train_id, n_shared) for
    every test doc sharing at least one distinct n-word shingle with a
    train doc — the standard check that an eval set has not leaked into
    the training corpus (n=13 is the common contamination window).

    Scale shape: both sides reduce to DISTINCT (id, shingle) tables; the
    join key is the shingle.  At n=13 a shared shingle is rare by
    construction EXCEPT boilerplate (licenses, headers) — shingles present
    in more than ``max_train_df`` train docs are dropped before the join
    (the same degenerate-key cap as LSH buckets; a license paragraph must
    not fan out test x train).  The drop is not silent: overlaps counted
    here are a LOWER bound and callers can re-run with a higher cap."""
    tr = shingles(train, k=n, id_col=id_col, text_col=text_col) \
        .withColumnRenamed("id", "train_id")
    # the train shingle table feeds the cap aggregate AND the overlap
    # join; without a cut the train-side explode runs twice
    cached = []
    if persist_intermediate:
        from pyspark import StorageLevel
        tr = tr.persist(StorageLevel.MEMORY_AND_DISK)
        cached = [tr]
    te = shingles(test, k=n, id_col=id_col, text_col=text_col) \
        .withColumnRenamed("id", "test_id")
    common = (tr.groupBy("shingle")
              .agg(F.count("*").alias("_df"))
              .filter(F.col("_df") <= max_train_df)
              .select("shingle"))
    tr_capped = tr.join(common, "shingle", "left_semi")
    out = (te.join(tr_capped, "shingle")
           .groupBy("test_id", "train_id")
           .agg(F.count("*").alias("n_shared")))
    from .cache import attach_cached_deps
    return attach_cached_deps(out, *cached)


def decontaminate(train: DataFrame, test: DataFrame, n: int = 13,
                  id_col: str = "doc_id", text_col: str = "text",
                  min_shared: int = 1,
                  max_train_df: int = 1000) -> DataFrame:
    """Drop every test doc sharing >= ``min_shared`` n-gram shingles with
    ANY train doc; returns the clean test rows unchanged.  One anti-join
    against the overlap probe — test rows, not shingles, are what ship."""
    ov = ngram_overlap(train, test, n=n, id_col=id_col,
                       text_col=text_col, max_train_df=max_train_df)
    dirty = (ov.filter(F.col("n_shared") >= min_shared)
             .select(F.col("test_id").alias(id_col)).distinct())
    out = test.join(dirty, id_col, "left_anti")
    from .cache import attach_cached_deps
    return attach_cached_deps(out, ov)


def simhash(df: DataFrame, bits: int = 32, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """SimHash fingerprint: per DISTINCT token take the first ``bits`` bits
    of md5(token); fingerprint bit i is 1 when more tokens set it than not.
    Output: (id, simhash long).  conv()-based, so portable.

    Computed entirely row-wise: distinct tokens via ``array_distinct`` and
    the ±1 bit sums via one ``aggregate`` fold over the per-row token-hash
    array — ZERO shuffles (the exploded formulation paid a distinct exchange
    plus a groupBy exchange; per-doc distinct equals per-row distinct, so
    the results are identical — the gate oracle is the exploded form).

    Input contract: ONE row per id (an id repeated across rows gets one
    fingerprint per row instead of one pooled fingerprint — pre-aggregate
    text per id first if ids can repeat).
    """
    toks = F.array_distinct(F.filter(
        F.split(_norm(F.col(text_col)), " "), lambda x: x != ""))
    hs = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, bits // 4), 16, 10)
                   .cast("long"))
    # bit i of h == (h % 2^(i+1)) >= 2^i — pure integer ops, no variable
    # shifts (Spark's shift functions take only literal counts)
    pows = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    zero = F.array_repeat(F.lit(0), bits)
    sums = F.aggregate(
        hs, zero,
        lambda acc, h: F.zip_with(
            acc, pows,
            lambda a, p: a + F.when((h % (p + p)) >= p,
                                    F.lit(1)).otherwise(F.lit(-1))))
    fp = F.aggregate(
        F.zip_with(sums, pows,
                   lambda s, p: F.when(s > 0, p)
                                 .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    # docs with zero tokens have no fingerprint (the exploded formulation
    # emits no row for them; the gate oracle mirrors that)
    return (df.select(F.col(id_col).alias("id"), toks.alias("_t"),
                      fp.alias("simhash"))
            .filter(F.size("_t") > 0).drop("_t"))


def incremental_candidates(new_docs: DataFrame, index_bands: DataFrame,
                           n_hashes: int = 16, rows_per_band: int = 4,
                           k: int = 3, id_col: str = "doc_id",
                           text_col: str = "text",
                           max_bucket: int = 1000) -> DataFrame:
    """Incremental near-dup screening: candidate pairs between a NEW batch
    of documents and an EXISTING corpus LSH index — the production daily-
    ingest path, where re-banding 100 TB per batch is not an option.

    ``index_bands``: the stored (id, band_idx, band_hash) table a prior
    ``minhash_band_buckets`` run wrote (same n_hashes / rows_per_band / k —
    band hashes are only comparable under identical parameters).

    Output: (new_id, index_id) distinct candidate pairs.

    Scale shape: the batch's bands are a zero-shuffle narrow map over the
    NEW docs only; the join against the stored index hits only matching
    (band_idx, band_hash) buckets — with the index bucketed/partitioned on
    the band hash this is an index lookup, never an index scan.  The
    ``max_bucket`` cap drops degenerate buckets by INDEX-side population
    (the same O(n^2) guard as the batch path).
    """
    new_bands = minhash_band_buckets(new_docs, n_hashes=n_hashes,
                                     rows_per_band=rows_per_band, k=k,
                                     id_col=id_col, text_col=text_col)
    sized = (index_bands.groupBy("band_idx", "band_hash")
             .agg(F.count("*").alias("sz"))
             .filter(F.col("sz") <= max_bucket)
             .select("band_idx", "band_hash"))
    idx = index_bands.join(sized, ["band_idx", "band_hash"])
    return (new_bands.select("band_idx", "band_hash",
                             F.col("id").alias("new_id"))
            .join(idx.select("band_idx", "band_hash",
                             F.col("id").alias("index_id")),
                  ["band_idx", "band_hash"])
            .filter(F.col("new_id") != F.col("index_id"))
            .select("new_id", "index_id").distinct())


def drop_repeated_passages(df: DataFrame, min_doc_freq: int = 3,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Passage-level boilerplate removal (the CCNet paragraph-dedup
    stage): split each document into sentence passages, count how many
    DISTINCT documents each normalized passage appears in corpus-wide,
    drop passages at or above ``min_doc_freq`` (cookie banners, footers,
    share-bars — text that repeats across unrelated pages), and
    reassemble each document's surviving passages in original order.

    Output: (id, clean_text, n_kept int, n_dropped int).  Reassembly
    joins with '. ' (the canonical sentence separator this engine's
    derived-span tooling uses); a fully-boilerplate document keeps an
    empty clean_text rather than disappearing.

    Scale shape: the passage frequency table is (digest, df) — passage-
    cardinality, far smaller than the corpus — built with map-side
    combine; the verdict join keys on the 128-bit digest (high
    cardinality, no skew beyond true boilerplate, which is exactly what
    the count identifies); reassembly is one hash aggregate per doc with
    sort_array pinning passage order.  Total: two exchanges.
    """
    p = (df.select(F.col(id_col).alias("id"),
                   F.posexplode(F.split(F.col(text_col), r"\. "))
                    .alias("pos", "passage"))
         .withColumn("_digest", F.md5(_norm(F.col("passage")))))
    freq = (p.select("id", "_digest").distinct()
            .groupBy("_digest")
            .agg(F.count("*").alias("_df")))
    marked = p.join(freq, "_digest")
    kept = F.col("_df") < min_doc_freq
    return (marked.groupBy("id")
            .agg(F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.when(
                        kept, F.struct(F.col("pos").alias("p"),
                                       F.col("passage").alias("t"))))),
                    lambda s: s.t), ". ").alias("clean_text"),
                 F.sum(kept.cast("int")).cast("int").alias("n_kept"),
                 F.sum((~kept).cast("int")).cast("int").alias("n_dropped")))


def merge_signature_shards(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two MinHash signature tables over DISJOINT shingle shards of
    the same documents (e.g. per-chunk signatures of a sharded ingest):
    the true signature of the union of shingle sets is the element-wise
    MIN of the shard signatures — min is associative/commutative, so
    shards merge in any order and incremental index maintenance never
    re-reads raw text.

    Input/output: (id, sig array<string>) — the array form
    ``_signature_array`` produces before banding.  Ids present in only
    one shard pass through unchanged.

    Scale shape: one equi-join on id + a narrow zip_with; signatures are
    n_hashes strings per doc regardless of document size."""
    sa = a.select(F.col("id"), F.col("sig").alias("_sa"))
    sb = b.select(F.col("id"), F.col("sig").alias("_sb"))
    merged = F.when(
        F.col("_sa").isNull(), F.col("_sb")).when(
        F.col("_sb").isNull(), F.col("_sa")).otherwise(
        F.zip_with("_sa", "_sb", lambda x, y: F.least(x, y)))
    return (sa.join(sb, "id", "full_outer")
            .select("id", merged.alias("sig")))


def lsh_collision_prob(s: float, bands: int, rows_per_band: int) -> float:
    """P(two docs with Jaccard similarity ``s`` share at least one LSH
    band) = 1 - (1 - s^r)^b — the textbook MinHash-LSH S-curve (Mining
    of Massive Datasets ch. 3).  Pure planning arithmetic, no Spark."""
    return 1.0 - (1.0 - s ** rows_per_band) ** bands


def lsh_tuning(threshold: float, n_hashes: int,
               fn_weight: float = 1.0, fp_weight: float = 1.0) -> dict:
    """Pick (bands, rows_per_band) for ``minhash_band_buckets`` given a
    target Jaccard ``threshold`` and a signature budget of ``n_hashes``.

    Enumerates every exact factorization b*r = h for h <= n_hashes and
    minimizes the weighted S-curve error: the integral of the collision
    probability below the threshold (false-positive mass, candidate
    pairs the Jaccard stage must then reject — wasted joins) plus the
    integral of the miss probability above it (false-negative mass,
    true near-dups LSH never proposes — silent recall loss).  Weights
    let a pipeline trade shuffle cost (fp) against recall (fn); the
    integrals use a 1000-point midpoint rule, deterministic.

    Returns {bands, rows_per_band, n_hashes_used, crossover, fp_mass,
    fn_mass} where crossover = (1/b)^(1/r), the similarity at which the
    S-curve passes ~0.5.  At 100 TB this choice IS the shuffle budget:
    bands multiply the band-bucket exchange width, rows sharpen the
    curve — tune here before provisioning the cluster, not after."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"lsh_tuning: threshold {threshold} not in (0,1)")
    if n_hashes < 2:
        raise ValueError(f"lsh_tuning: n_hashes {n_hashes} < 2")
    best = None
    n_pts = 1000
    for h in range(2, n_hashes + 1):
        for r in range(1, h + 1):
            if h % r:
                continue
            b = h // r
            fp = fn = 0.0
            for i in range(n_pts):
                s = (i + 0.5) / n_pts
                p = lsh_collision_prob(s, b, r)
                if s < threshold:
                    fp += p
                else:
                    fn += 1.0 - p
            fp /= n_pts
            fn /= n_pts
            cost = fp_weight * fp + fn_weight * fn
            # prefer fewer hashes on ties: cheaper signatures
            key = (cost, h, r)
            if best is None or key < best[0]:
                best = (key, {"bands": b, "rows_per_band": r,
                              "n_hashes_used": h,
                              "crossover": round((1.0 / b) ** (1.0 / r), 6),
                              "fp_mass": round(fp, 6),
                              "fn_mass": round(fn, 6)})
    return best[1]
