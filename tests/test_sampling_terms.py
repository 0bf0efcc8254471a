"""Deterministic sampling / split assignment (datapipe/sampling.py) and
corpus term stats (datapipe/terms.py): the reproducibility invariants
df.sample cannot give, plus zero-shuffle plan shapes."""

import pyspark.sql.functions as F
import pytest

from vlm_ocr_doc_reader_spark.datapipe.sampling import (assign_splits,
                                                        deterministic_sample,
                                                        stratified_sample)
from vlm_ocr_doc_reader_spark.datapipe.terms import (heavy_hitters,
                                                     tfidf_top_terms)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id") \
        .withColumn("lang", F.when(F.col("doc_id") % 10 < 7, "en")
                             .when(F.col("doc_id") % 10 < 9, "de")
                             .otherwise("zh"))


def test_sample_is_deterministic_and_nested(ids):
    s10 = {r["doc_id"] for r in deterministic_sample(ids, 0.10).collect()}
    s10b = {r["doc_id"] for r in deterministic_sample(ids, 0.10).collect()}
    s20 = {r["doc_id"] for r in deterministic_sample(ids, 0.20).collect()}
    assert s10 == s10b                      # rerun-stable
    assert s10 <= s20                       # nested: dialing down only drops
    assert 0.07 < len(s10) / 2000 < 0.13    # roughly the asked fraction
    # repartitioning must not change membership (df.sample fails this)
    rep = {r["doc_id"]
           for r in deterministic_sample(ids.repartition(13), 0.10).collect()}
    assert rep == s10


def test_sample_plan_is_narrow(ids):
    q = deterministic_sample(ids, 0.5)
    p = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    assert "Exchange" not in p


def test_stratified_sample_fractions(ids):
    out = stratified_sample(ids, {"zh": 1.0, "en": 0.1}, "lang",
                            default_fraction=0.5)
    got = {r["lang"]: r["cnt"] for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    n = {r["lang"]: r["cnt"] for r in
         ids.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert got["zh"] == n["zh"]                       # keep-all stratum
    assert got["en"] < 0.2 * n["en"]                  # downsampled stratum
    assert 0.35 * n["de"] < got["de"] < 0.65 * n["de"]  # default stratum


def test_assign_splits_partitions_everything(ids):
    out = assign_splits(ids, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["cnt"] for r in
              out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(counts.values()) == 2000               # total partition
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 1400
    # stable across reruns and independent of the sample draw (salts differ)
    again = {(r["doc_id"], r["split"]) for r in assign_splits(
        ids, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    first = {(r["doc_id"], r["split"]) for r in out.collect()}
    assert first == again

    with pytest.raises(ValueError):
        assign_splits(ids, {"a": 0.5, "b": 0.6})


def test_heavy_hitters_and_tfidf(spark):
    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple cherry"),
         (3, "banana banana banana date")],
        "doc_id int, text string")
    hh = heavy_hitters(docs, k=2).collect()
    assert [(r["token"], r["n_occurrences"], r["n_docs"]) for r in hh] == [
        ("banana", 4, 2), ("apple", 3, 2)]

    tt = {r["id"]: r["token"] for r in
          tfidf_top_terms(docs, k=1).collect()}
    # 'date' is unique to doc 3 but tf=1 vs banana tf=3: banana wins there;
    # doc 2's 'cherry' (unique) beats the common 'apple'
    assert tt[2] == "cherry" and tt[3] == "banana"


def test_weighted_sample_topk_proportional_and_stable(spark):
    """Heavier rows win more often (exponential race), exactly k rows come
    back, zero-weight rows never appear, and the sample is repartition-
    stable."""
    import pyspark.sql.functions as F

    from vlm_ocr_doc_reader_spark.datapipe.sampling import weighted_sample_topk
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 100.0)     # heavy 10%
         .when(F.col("id") < 900, 1.0)       # light 80%
         .otherwise(0.0).alias("w"))         # excluded 10%
    got = weighted_sample_topk(df, k=100, weight_col="w").collect()
    assert len(got) == 100
    ids = {r["doc_id"] for r in got}
    assert not any(i >= 900 for i in ids)  # zero weight excluded
    n_heavy = len([i for i in ids if i < 100])
    # heavy rows are 100x likelier per unit: expect most of the sample
    assert n_heavy > 60
    got2 = {r["doc_id"]
            for r in weighted_sample_topk(df.repartition(17), k=100,
                                          weight_col="w").collect()}
    assert ids == got2


def test_weighted_sample_large_weights_not_id_selection(spark):
    """Regression: rounding the race key before ordering collapsed
    realistic large weights (key ~ 1e-6) into ties broken by id, turning
    the sampler into smallest-k-ids.  With full-precision ordering the
    sample of equal-weight rows must NOT be the k smallest ids."""
    import pyspark.sql.functions as F

    from vlm_ocr_doc_reader_spark.datapipe.sampling import weighted_sample_topk
    df = spark.range(1000).select(F.col("id").alias("doc_id"),
                                  F.lit(1_000_000.0).alias("w"))
    ids = sorted(r["doc_id"]
                 for r in weighted_sample_topk(df, 50, "w").collect())
    assert ids != list(range(50))  # hash race, not id order
    assert len(ids) == 50


def test_curate_corpus_policies(spark):
    """Each drop policy fires on a doc built to trigger exactly it, and
    survivors carry a split assignment."""
    from vlm_ocr_doc_reader_spark.datapipe.curate import curate_corpus
    good = ("the data and the model of the pipeline runs well and the "
            "results are good and the work continues for the team today.")
    rows = [
        (1, good),                          # survives
        (2, good),                          # exact dup of 1 -> dropped
        (3, good + " extra tail word."),    # near dup of 1 -> dropped
        (4, "der Tisch und die Daten der der und und die die der und."),  # de
        (5, "!!!"),                         # quality floor
        (6, "the unique and different of content about spark engines "
            "and the rows and the tables and the shuffles everywhere."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in curate_corpus(
        df, min_quality=0.3, jaccard_threshold=0.5).collect()}
    assert set(out) == {1, 6}
    assert all(r["pred_lang"] == "en" for r in out.values())
    assert all(r["split"] in ("train", "val", "test") for r in out.values())


def test_curate_corpus_component_policy_keeps_chain_representative(spark):
    """greedy drops every doc similar to a smaller id (chain a-b-c loses b
    and c); component keeps exactly one doc per transitive cluster — same
    outcome here (min id survives), but asserted through the component
    path, plus the unknown-policy guard."""
    import pytest

    from vlm_ocr_doc_reader_spark.datapipe.curate import curate_corpus
    base = ("the data and the model of the pipeline runs well and the "
            "results are good and the work continues for the team today")
    rows = [(1, base + "."),
            (2, base + " extra."),
            (3, base + " extra tail."),
            (9, "the unique and different of content about spark engines "
                "and the rows and the tables and the shuffles everywhere.")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"] for r in curate_corpus(
        df, min_quality=0.3, jaccard_threshold=0.5,
        survivor_policy="component").collect()}
    assert out == {1, 9}
    with pytest.raises(ValueError, match="survivor_policy"):
        curate_corpus(df, survivor_policy="nope")


def test_curate_corpus_cache_released(spark):
    """curate_corpus persists intermediates at several layers (deduped
    frame + the LSH band / candidate / token caches of its sub-operators);
    release_intermediate must free ALL of them, and
    persist_intermediate=False must persist nothing anywhere."""
    from pyspark import StorageLevel

    from vlm_ocr_doc_reader_spark.datapipe.curate import (
        curate_corpus, release_intermediate)
    df = spark.createDataFrame(
        [(i, "the data and the model of the pipeline runs well and the "
             f"results are good and the work continues number {i}.")
         for i in range(8)], "doc_id long, text string")
    out = curate_corpus(df, min_quality=0.2, jaccard_threshold=0.99)
    n = out.count()
    handles = out._cached_deps
    assert len(handles) >= 3  # exact + bands + cand/toks at least
    assert all(h.storageLevel != StorageLevel.NONE for h in handles)
    release_intermediate(out)
    assert all(h.storageLevel == StorageLevel.NONE for h in handles)
    release_intermediate(out)  # idempotent

    plain = curate_corpus(df, min_quality=0.2, jaccard_threshold=0.99,
                          persist_intermediate=False)
    assert not getattr(plain, "_cached_deps", [])
    assert plain.count() == n
    release_intermediate(plain)  # no-op, no raise


def test_bigram_logprob_word_salad_below_prose(spark):
    """Same common tokens, scrambled transitions -> lower bigram score;
    the discrimination the unigram model cannot make."""
    from vlm_ocr_doc_reader_spark.datapipe.terms import bigram_logprob_score
    prose = "the cat sat on the mat"
    rows = [(i, prose) for i in range(8)]            # common transitions
    rows += [(100, "mat the on sat cat the")]        # same tokens, scrambled
    rows += [(200, "solo")]                          # 1 token: no bigrams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in bigram_logprob_score(df).collect()}
    assert out[0]["avg_logprob"] > out[100]["avg_logprob"]
    assert 200 not in out                            # nothing to score
    assert out[0]["n_bigrams"] == 5


def test_bigram_logprob_partition_invariant(spark):
    from vlm_ocr_doc_reader_spark.datapipe.terms import bigram_logprob_score
    import random
    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(20)]
    rows = [(i, " ".join(rng.choices(vocab, k=30))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(str, bigram_logprob_score(df).collect()))
    b = sorted(map(str, bigram_logprob_score(df.repartition(7)).collect()))
    assert a == b
