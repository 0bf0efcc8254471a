"""End-to-end corpus curation: the composition a training-data pipeline
actually runs, built entirely from this package's gated operators.

    quality filter  ->  language filter  ->  exact dedup (canonical id)
    ->  near-dup dedup (MinHash-LSH proposes, exact Jaccard disposes,
        greedy keep-smallest-id survivor)  ->  train/val/test assignment

Every stage is the already-oracled operator (textstats.quality_features,
textstats.lang_id, dedup.*, sampling.assign_splits), so the composed
pipeline has an exact end-to-end DuckDB oracle too (contract `curation`).

Scale shape: filters and hashes are narrow; the only exchanges are exact
dedup's digest aggregate and the LSH bucket/candidate joins — each
individually bounded (bucket cap, candidate-driven Jaccard).  Nothing here
collects to the driver.

Near-dup survivor policy is GREEDY: any document similar (>= threshold) to
a SMALLER-id document is dropped, even if that smaller document was itself
dropped by an earlier pair (no transitive re-instatement).  That
over-drops chains slightly but is deterministic, one-pass, and
SQL-expressible — the standard web-scale choice over union-find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (_norm, jaccard_pairs, minhash_band_buckets,
                    minhash_candidate_pairs)
from .sampling import assign_splits
from .textstats import lang_id, quality_features


def curate_corpus(docs: DataFrame,
                  min_quality: float = 0.55,
                  langs: tuple[str, ...] = ("en",),
                  jaccard_threshold: float = 0.8,
                  n_hashes: int = 8, rows_per_band: int = 2,
                  k_shingle: int = 3,
                  split_weights: dict | None = None,
                  id_col: str = "doc_id",
                  text_col: str = "text",
                  persist_intermediate: bool = True,
                  survivor_policy: str = "greedy") -> DataFrame:
    """documents -> curated (id, pred_lang, quality_score, split).

    One row per SURVIVING document; every drop is one of the four
    documented policies (quality floor, language allowlist, exact-dup
    non-canonical, near-dup greater-id).

    ``survivor_policy``: ``'greedy'`` (default, the gate-oracled rule)
    drops any doc similar to a smaller-id doc — one-pass, SQL-expressible,
    but over-drops chains (a-b-c similar pairwise in a chain loses b AND c
    even though c is not similar to a).  ``'component'`` runs connected
    components over the similar-pair graph and keeps exactly one doc (the
    min id) per transitive cluster — the principled policy, costing the
    O(diameter) label-propagation rounds of ``dedup.connected_components``
    (near-dup clusters are shallow, so 2-4 rounds).

    Cache lifetime: with ``persist_intermediate`` the deduped frame is
    persisted (three downstream consumers) and the handle is attached to
    the returned DataFrame; call :func:`release_intermediate` on the result
    once it has been materialized/written to free the cached partitions —
    otherwise they live until the session ends.  Pass
    ``persist_intermediate=False`` to skip caching entirely (recompute per
    branch — correct, slower)."""
    weights = split_weights or {"train": 0.8, "val": 0.1, "test": 0.1}

    # compute-dense narrow chain ahead (regex quality/lang, MinHash
    # signatures): lift small single-split inputs to cluster parallelism
    # (no-op when the input already has enough partitions)
    from ..sources.readers import ensure_min_partitions
    docs = ensure_min_partitions(docs)

    scored = quality_features(docs, text_col=text_col) \
        .filter(F.col("quality_score") >= min_quality)
    tagged = lang_id(scored, text_col=text_col) \
        .filter(F.col("pred_lang").isin(*langs))

    # exact dedup: canonical (min id) per normalized-text digest survives
    digested = tagged.withColumn("_digest", F.md5(_norm(F.col(text_col))))
    # the digest frame feeds BOTH sides of the canonical semi-join; the
    # exact-persist below sits ABOVE the join, so without this pin the
    # whole quality+lang+digest chain re-runs per side (two ~11 CPU-s
    # stages per cold run at sf0.1)
    if persist_intermediate:
        from pyspark import StorageLevel
        digested = digested.persist(StorageLevel.MEMORY_AND_DISK)
    canon = (digested.groupBy("_digest")
             .agg(F.min(id_col).alias(id_col)))
    exact = digested.join(canon, ["_digest", id_col], "left_semi") \
        .drop("_digest")
    # three consumers follow (LSH bucketing, Jaccard's token table, the
    # final anti-join) — without a persist Catalyst re-runs the whole
    # quality+lang+dedup chain per branch (measured 38s -> ~13s at sf0.01);
    # on a cluster the same cut is a checkpoint of the deduped frame
    if persist_intermediate:
        from pyspark import StorageLevel
        exact = exact.persist(StorageLevel.MEMORY_AND_DISK)

    # near-dup dedup: LSH candidates -> exact Jaccard -> drop greater ids
    cand = minhash_candidate_pairs(
        minhash_band_buckets(exact, n_hashes=n_hashes,
                             rows_per_band=rows_per_band, k=k_shingle,
                             id_col=id_col, text_col=text_col),
        persist_intermediate=persist_intermediate)
    jac = jaccard_pairs(exact, candidates=cand, k=k_shingle,
                        id_col=id_col, text_col=text_col,
                        persist_intermediate=persist_intermediate)
    similar = jac.filter(F.col("jaccard") >= jaccard_threshold)
    if survivor_policy == "greedy":
        drop_ids = similar.select(F.col("id_b").alias(id_col)).distinct()
    elif survivor_policy == "component":
        from .dedup import connected_components
        comps = connected_components(similar.select("id_a", "id_b"))
        drop_ids = (comps.filter(F.col("id") != F.col("component"))
                    .select(F.col("id").alias(id_col)))
    else:
        raise ValueError(
            f"curate_corpus: unknown survivor_policy {survivor_policy!r} "
            "(expected 'greedy' or 'component')")
    survivors = exact.join(drop_ids, id_col, "left_anti")

    out = (assign_splits(survivors, weights, id_col=id_col)
           .select(id_col, "pred_lang", "quality_score", "split"))
    from .cache import attach_cached_deps
    if persist_intermediate:
        # fold in EVERY cache below: our deduped frame plus the handles
        # the LSH/Jaccard sub-operators persisted (jac carries cand's too)
        attach_cached_deps(out, jac, exact, digested)
    return out


def release_intermediate(curated: DataFrame) -> None:
    """Unpersist every cached intermediate a :func:`curate_corpus` result
    carries — the deduped frame AND the LSH band / candidate / token
    caches its sub-operators persisted.  Call AFTER the result is
    materialized (collected/written): unpersisting earlier is still
    correct — Spark recomputes — but forfeits the cache the pipeline paid
    for.  No-op for results built with ``persist_intermediate=False``.
    NOTE: the handles ride on the exact returned object; a further
    transformation (.filter etc.) returns a NEW DataFrame without them —
    release the original."""
    from .cache import release_cached
    release_cached(curated)
