"""Round-5 operators: BM25 retrieval, per-group caps, rolling features,
decayed aggregates, SCD-2 history, containment, winsorized stats, bigram
PMI, BPE pair counts — behavioral tests on controlled inputs (the DuckDB
gate covers oracle equality; these pin the semantics a user relies on).
"""

from datetime import datetime

import pyspark.sql.functions as F

from vlm_ocr_doc_reader_spark.datapipe.dedup import containment_pairs
from vlm_ocr_doc_reader_spark.datapipe.history import scd2_history
from vlm_ocr_doc_reader_spark.datapipe.outliers import winsorized_stats
from vlm_ocr_doc_reader_spark.datapipe.sampling import cap_per_group
from vlm_ocr_doc_reader_spark.datapipe.search import bm25_search
from vlm_ocr_doc_reader_spark.datapipe.sessions import (decayed_sum,
                                                        rolling_stats)
from vlm_ocr_doc_reader_spark.datapipe.terms import (bigram_pmi,
                                                     bpe_pair_counts)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double")


def test_bm25_ranks_full_match_first(spark):
    d = _docs(spark, [
        (1, "alpha beta gamma"),              # all three query terms
        (2, "alpha beta filler filler"),      # two
        (3, "alpha filler filler filler"),    # one
        (4, "filler junk nothing here"),      # zero -> absent
    ])
    out = bm25_search(d, ["alpha", "beta", "gamma"], k=10).collect()
    ids = [r["id"] for r in out]
    assert ids[0] == 1
    assert 4 not in ids
    assert [r["n_matched"] for r in out if r["id"] == 1] == [3]
    scores = {r["id"]: r["score"] for r in out}
    assert scores[1] > scores[2] > scores[3]


def test_bm25_idf_favors_rare_terms(spark):
    rows = [(i, "common filler") for i in range(1, 9)]
    rows += [(9, "common rare")]
    out = bm25_search(_docs(spark, rows), ["common", "rare"], k=10).collect()
    best = max(out, key=lambda r: r["score"])
    assert best["id"] == 9  # the doc holding the rare term wins


def test_cap_per_group_caps_and_is_repartition_stable(spark):
    rows = [(i, f"s{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_group(df, cap=10, group_col="source")
    counts = {r["source"]: r["cnt"] for r in
              out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"s0": 10, "s1": 10, "s2": 10}
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               cap_per_group(df.repartition(7), cap=10,
                             group_col="source").collect())
    assert a == b  # hash order, not partition order


def test_cap_per_group_passes_small_groups_through(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")],
                               "doc_id long, source string")
    assert cap_per_group(df, cap=10, group_col="source").count() == 3


def test_rolling_stats_hand_computed(spark):
    ev = _events(spark, [
        (i, 1, datetime(2024, 1, 1, 0, i), "e", float(i)) for i in range(6)])
    out = {r["event_id"]: r for r in rolling_stats(ev, n=3).collect()}
    assert out[0]["n_window"] == 1 and out[0]["rolling_mean"] == 0.0
    assert out[2]["n_window"] == 3 and out[2]["rolling_mean"] == 1.0
    # event 5 window = values {3,4,5}
    assert out[5]["n_window"] == 3
    assert out[5]["rolling_mean"] == 4.0
    assert out[5]["rolling_max"] == 5.0


def test_decayed_sum_halves_per_half_life(spark):
    anchor = "2024-01-02 00:00:00"
    ev = _events(spark, [
        (1, 1, datetime(2024, 1, 2, 0, 0), "e", 8.0),    # age 0h -> 8
        (2, 1, datetime(2024, 1, 1, 0, 0), "e", 8.0),    # age 24h -> 4
        (3, 1, datetime(2023, 12, 31, 0, 0), "e", 8.0),  # age 48h -> 2
    ])
    out = decayed_sum(ev, half_life_hours=24.0, anchor_ts=anchor).collect()
    assert len(out) == 1
    assert out[0]["decayed_value"] == 14.0
    assert out[0]["n_events"] == 3


def test_scd2_history_intervals_and_collapse(spark):
    ev = _events(spark, [
        (1, 1, datetime(2024, 1, 1, 0), "view", 0.0),
        (2, 1, datetime(2024, 1, 1, 1), "view", 0.0),    # no-op change
        (3, 1, datetime(2024, 1, 1, 2), "click", 0.0),
        (4, 1, datetime(2024, 1, 1, 3), "view", 0.0),    # back again
        (5, 2, datetime(2024, 1, 1, 0), "buy", 0.0),
    ])
    out = scd2_history(ev, key_col="user_id", value_col="event_type")
    rows = sorted(out.collect(), key=lambda r: (r["user_id"],
                                                r["valid_from"]))
    u1 = [r for r in rows if r["user_id"] == 1]
    assert [r["value"] for r in u1] == ["view", "click", "view"]
    # half-open intervals chain exactly
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert [r["is_current"] for r in u1] == [False, False, True]
    u2 = [r for r in rows if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"]
    # collapse off: one interval per raw row
    assert scd2_history(ev, key_col="user_id", value_col="event_type",
                        collapse_unchanged=False).count() == 5


def test_containment_catches_embedded_doc(spark):
    small = "alpha beta gamma delta"
    big = small + " " + " ".join(f"w{i}" for i in range(40))
    d = _docs(spark, [(1, small), (2, big), (3, "unrelated stuff entirely")])
    out = {(r["id_a"], r["id_b"]): r for r in
           containment_pairs(d, k=1).collect()}
    r = out[(1, 2)]
    assert r["containment_a"] == 1.0       # all of doc1 lives in doc2
    assert r["containment_b"] < 0.2        # doc2 barely overlaps doc1
    assert (1, 3) not in out and (3, 1) not in out


def test_winsorized_stats_clamps(spark):
    # values 1..9 plus a 1000 outlier; p05/p95 clamp tames it
    rows = [(i, 1, datetime(2024, 1, 1, 0, i), "e", float(v))
            for i, v in enumerate(list(range(1, 10)) + [1000])]
    out = winsorized_stats(_events(spark, rows), "value").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 10
    assert r["p_hi"] < 1000  # the outlier itself is clamped
    assert r["win_mean"] < 60


def test_bigram_pmi_finds_collocation(spark):
    # "new york" always adjacent; "the" ubiquitous -> low PMI
    rows = [(i, "the new york office of the firm") for i in range(5)]
    rows += [(10 + i, "the office the firm the desk") for i in range(5)]
    out = bigram_pmi(_docs(spark, rows), k=10, min_count=3).collect()
    pairs = [(r["tok_x"], r["tok_y"]) for r in out]
    assert ("new", "york") in pairs
    top = out[0]
    assert (top["tok_x"], top["tok_y"]) == ("new", "york")


def test_bpe_pair_counts_hand_checked(spark):
    d = _docs(spark, [(1, "aba ab"), (2, "ba")])
    out = {(r["sym_a"], r["sym_b"]): r["n"]
           for r in bpe_pair_counts(d, k=10).collect()}
    # "aba": (a,b), (b,a); "ab": (a,b); "ba": (b,a)
    assert out == {("a", "b"): 2, ("b", "a"): 2}


def test_incremental_candidates_finds_cross_batch_dups(spark):
    from vlm_ocr_doc_reader_spark.datapipe.dedup import (
        incremental_candidates, minhash_band_buckets)
    corpus_text = ("the quick brown fox jumps over the lazy dog and then "
                   "runs far away into the quiet green forest tonight")
    index_docs = _docs(spark, [
        (100, corpus_text),
        (101, "completely different content about databases and queries "
              "running on large analytical engines every day"),
    ])
    index_bands = minhash_band_buckets(index_docs, n_hashes=8,
                                       rows_per_band=2, k=3)
    new_docs = _docs(spark, [
        (1, corpus_text),                       # exact dup of index 100
        (2, "fresh unseen words entirely novel text with no overlap "
            "whatsoever in any shingle of the stored corpus index"),
    ])
    out = incremental_candidates(new_docs, index_bands,
                                 n_hashes=8, rows_per_band=2, k=3)
    pairs = {(r["new_id"], r["index_id"]) for r in out.collect()}
    assert (1, 100) in pairs
    assert not any(n == 2 for n, _ in pairs)


def test_incremental_candidates_never_rebands_index(spark):
    """The index side must be consumed as-is: only 2 scans total and the
    new-batch banding plan contains no index text column."""
    from vlm_ocr_doc_reader_spark.datapipe.dedup import (
        incremental_candidates, minhash_band_buckets)
    idx = minhash_band_buckets(
        _docs(spark, [(100, "stored corpus text here")]),
        n_hashes=8, rows_per_band=2, k=3)
    # materialize the index as a table (as production would)
    idx.createOrReplaceTempView("_stored_bands")
    stored = spark.table("_stored_bands")
    out = incremental_candidates(
        _docs(spark, [(1, "stored corpus text here")]), stored,
        n_hashes=8, rows_per_band=2, k=3)
    assert out.count() == 1


def test_curriculum_buckets_monotone_and_balanced(spark):
    from vlm_ocr_doc_reader_spark.datapipe.sampling import curriculum_buckets
    df = spark.createDataFrame([(i, float(i)) for i in range(100)],
                               "doc_id long, score double")
    out = curriculum_buckets(df, "score", n_buckets=10).collect()
    by_id = {r["doc_id"]: r["bucket"] for r in out}
    # monotone in score
    assert all(by_id[i] <= by_id[i + 1] for i in range(99))
    assert min(by_id.values()) == 0 and max(by_id.values()) == 9
    from collections import Counter
    sizes = Counter(by_id.values())
    assert max(sizes.values()) - min(sizes.values()) <= 2  # ~balanced
    # repartition-invariant
    out2 = {r["doc_id"]: r["bucket"] for r in
            curriculum_buckets(df.repartition(7), "score",
                               n_buckets=10).collect()}
    assert by_id == out2


def test_quality_classifier_orders_prose_above_junk(spark):
    from vlm_ocr_doc_reader_spark.datapipe.textstats import (
        quality_classifier)
    d = _docs(spark, [
        (1, "The committee decided that the proposal should be reviewed "
            "again because it was not complete and the schedule was at "
            "risk for the coming quarter."),
        (2, "$$$ !!! @@@ ### %%% ^^^ &&& *** ((( ))) ??? >>> <<<"),
    ])
    out = {r["doc_id"]: r for r in quality_classifier(d).collect()}
    assert out[1]["clf_score"] > out[2]["clf_score"]
    assert out[1]["clf_keep"] and not out[2]["clf_keep"]


def test_corpus_diff_statuses(spark):
    from vlm_ocr_doc_reader_spark.datapipe.report import corpus_diff
    old = _docs(spark, [(1, "same text"), (2, "will change"),
                        (3, "will be removed")])
    new = _docs(spark, [(1, "same text"), (2, "has changed"),
                        (4, "brand new")])
    out = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    # digest-based: whitespace/case-only edits are NOT changes
    new2 = _docs(spark, [(1, "  SAME   text "), (2, "will change"),
                         (3, "will be removed")])
    out2 = {r["doc_id"]: r["status"]
            for r in corpus_diff(old, new2).collect()}
    assert out2 == {1: "unchanged", 2: "unchanged", 3: "unchanged"}


def test_key_skew_report_flags_heavy_key(spark):
    from vlm_ocr_doc_reader_spark.operators.skew import key_skew_report
    rows = [(i, 1 if i < 80 else i, datetime(2024, 1, 1), "e", 0.0)
            for i in range(100)]
    ev = _events(spark, rows)
    out = key_skew_report(ev, "user_id", k=5).collect()
    top = out[0]
    assert top["key"] == "1" and top["n"] == 80
    assert top["share"] == 0.8
    assert top["x_mean"] > 10  # 80 rows vs mean ~4.8 per key


def test_incremental_candidates_compose_with_jaccard_verify(spark):
    """End-to-end incremental pipeline: LSH proposes cross-batch pairs,
    exact Jaccard (candidate-driven) disposes — pure composition of
    existing operators, no bespoke code path."""
    from vlm_ocr_doc_reader_spark.datapipe.dedup import (
        incremental_candidates, jaccard_pairs, minhash_band_buckets)
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    near = base.replace("sigma", "SIGMA-PRIME")      # high-Jaccard variant
    index_docs = _docs(spark, [(100, base), (101, "totally other words "
                                                  "about nothing shared")])
    new_docs = _docs(spark, [(1, near), (2, "novel unrelated content "
                                            "every token fresh")])
    cand = incremental_candidates(
        new_docs, minhash_band_buckets(index_docs, 8, 2, k=3),
        n_hashes=8, rows_per_band=2, k=3)
    pairs = cand.select(F.col("new_id").alias("id_a"),
                        F.col("index_id").alias("id_b"))
    both = new_docs.unionByName(index_docs)
    verified = jaccard_pairs(both, candidates=pairs, k=3)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert (1, 100) in rows and rows[(1, 100)] > 0.7
    assert all(a != 2 for a, _ in rows)


def test_drop_repeated_passages_ccnet_semantics(spark):
    from vlm_ocr_doc_reader_spark.datapipe.dedup import \
        drop_repeated_passages
    banner = "Subscribe to our newsletter"
    footer = "All rights reserved"
    docs = _docs(spark, [
        (1, f"{banner}. unique thoughts about turbines. {footer}"),
        (2, f"{banner}. a different take on pumps. {footer}"),
        (3, f"{banner}. compressors considered harmful. {footer}"),
        (4, "standalone essay with no boilerplate at all"),
    ])
    out = {r["id"]: r for r in
           drop_repeated_passages(docs, min_doc_freq=3).collect()}
    assert out[1]["clean_text"] == "unique thoughts about turbines"
    assert out[1]["n_dropped"] == 2 and out[1]["n_kept"] == 1
    assert out[4]["clean_text"].startswith("standalone essay")
    assert out[4]["n_dropped"] == 0
    # normalization-insensitive: case/whitespace variants still count as
    # the same passage
    docs2 = _docs(spark, [
        (1, f"{banner}. body one"), (2, f"{banner.upper()}. body two"),
        (3, f"  {banner} . body three".replace(" .", ".")),
    ])
    out2 = {r["id"]: r for r in
            drop_repeated_passages(docs2, min_doc_freq=3).collect()}
    assert all(out2[i]["n_dropped"] == 1 for i in (1, 2, 3))


def test_drop_repeated_passages_all_boilerplate_doc_survives(spark):
    from vlm_ocr_doc_reader_spark.datapipe.dedup import \
        drop_repeated_passages
    docs = _docs(spark, [(i, "same thing everywhere") for i in range(4)])
    out = {r["id"]: r for r in
           drop_repeated_passages(docs, min_doc_freq=2).collect()}
    assert len(out) == 4                      # docs never disappear
    assert all(r["clean_text"] == "" and r["n_kept"] == 0
               for r in out.values())


def test_merge_signature_shards_equals_unsharded(spark):
    """Element-wise min of per-shard signatures == signature of the whole
    text (min over a union = min of mins) — the incremental index
    maintenance identity."""
    from vlm_ocr_doc_reader_spark.datapipe.dedup import (
        _signature_array, merge_signature_shards)
    full = "alpha beta gamma delta epsilon zeta eta theta"
    part1, part2 = "alpha beta gamma delta", "epsilon zeta eta theta"

    def sigs(rows):
        df = spark.createDataFrame(rows, "id long, text string")
        return df.select("id", _signature_array(1, 8, "text").alias("sig"))

    whole = {r["id"]: list(r["sig"]) for r in sigs([(1, full)]).collect()}
    merged_df = merge_signature_shards(sigs([(1, part1), (2, "only a")]),
                                       sigs([(1, part2)]))
    merged = {r["id"]: list(r["sig"]) for r in merged_df.collect()}
    assert merged[1] == whole[1]
    assert len(merged[2]) == 8          # single-shard id passes through


def test_truncate_to_token_budget(spark):
    from vlm_ocr_doc_reader_spark.datapipe.assembly import \
        truncate_to_token_budget
    d = _docs(spark, [
        (1, "one two three. four five. six seven eight nine"),
        (2, "tiny doc"),
        (3, "first sentence is already way over the budget limit here"),
    ])
    out = {r["doc_id"]: r for r in
           truncate_to_token_budget(d, max_tokens=5).collect()}
    # doc 1: sentences of 3/2/4 tokens; 3+2=5 fits, +4 would not
    assert out[1]["text"] == "one two three. four five"
    assert out[1]["n_tokens_kept"] == 5 and out[1]["was_truncated"]
    # doc 2 untouched
    assert out[2]["text"] == "tiny doc" and not out[2]["was_truncated"]
    # doc 3: over-budget first sentence still kept (no vanishing docs)
    assert out[3]["text"].startswith("first sentence")
    assert out[3]["n_tokens_kept"] > 5 and not out[3]["was_truncated"]
