"""Sketch operators: determinism, error bounds vs exact answers, and the
structural guarantees (CMS never undercounts; KMV exact below k; histogram
quantile error bounded by one bin width)."""

import pyspark.sql.functions as F

from vlm_ocr_doc_reader_spark.datapipe.sketches import (cms_build, cms_query,
                                                        histogram_quantiles,
                                                        kmv_estimate,
                                                        kmv_sketch)


def test_kmv_exact_below_k_and_bounded_error_above(spark):
    small = spark.range(40).select(
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    got = kmv_estimate(kmv_sketch(small, "v", k=64), k=64).collect()
    assert got[0]["distinct_est"] == 40.0  # sketch saw everything: exact

    big = spark.range(5000).select(
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    est = kmv_estimate(kmv_sketch(big, "v", k=64), k=64) \
        .collect()[0]["distinct_est"]
    # std err ~ 1/sqrt(k) = 12.5%; deterministic hashes -> fixed value,
    # assert within 3 sigma
    assert abs(est - 5000) / 5000 < 0.375


def test_kmv_grouped_and_duplicate_insensitive(spark):
    """Duplicates must not move the estimate (hash SET semantics)."""
    base = [("g1", f"v{i}") for i in range(30)]
    df = spark.createDataFrame(base + base * 3 + [("g2", "only")],
                               "g string, v string")
    got = {r["g"]: r["distinct_est"]
           for r in kmv_estimate(kmv_sketch(df, "v", k=64,
                                            group_cols=["g"])).collect()}
    assert got == {"g1": 30.0, "g2": 1.0}


def test_kmv_shard_merge_matches_single_shard(spark):
    """The two-stage shard-and-merge must equal the unsharded sketch —
    merging KMV sketches is exact by construction."""
    df = spark.range(500).select(F.concat(F.lit("x"), F.col("id")).alias("v"))
    a = kmv_sketch(df, "v", k=32, n_shards=1).collect()[0]["kmins"]
    b = kmv_sketch(df, "v", k=32, n_shards=16).collect()[0]["kmins"]
    assert a == b


def test_cms_never_undercounts_and_is_exact_without_collisions(spark):
    rows = [("a",)] * 100 + [("b",)] * 10 + [("c",)] * 1
    toks = spark.createDataFrame(rows, "tok string")
    sk = cms_build(toks, "tok", depth=4, width=256)
    items = spark.createDataFrame([("a",), ("b",), ("c",), ("missing",)],
                                  "tok string")
    got = {r["item"]: r["est_count"]
           for r in cms_query(sk, items, "tok", 4, 256).collect()}
    truth = {"a": 100, "b": 10, "c": 1, "missing": 0}
    for k, v in truth.items():
        assert got[k] >= v  # CMS guarantee: overestimate only
    # 3 tokens in 4x256 counters: no collisions, so exact
    assert got == truth
    # sketch size is bounded by depth*width regardless of input size
    assert sk.count() <= 4 * 256


def test_histogram_quantiles_within_one_bin_width(spark):
    vals = spark.createDataFrame([(float(i),) for i in range(1001)],
                                 "x double")
    got = {r["q"]: r["value"]
           for r in histogram_quantiles(vals, "x", [0.5, 0.95],
                                        n_bins=100).collect()}
    bin_width = 1000 / 100
    assert abs(got[0.5] - 500) <= bin_width
    assert abs(got[0.95] - 950) <= bin_width
    # duplicate quantiles collapse to one row per DISTINCT q (documented)
    dup = histogram_quantiles(vals, "x", [0.5, 0.5], n_bins=100).collect()
    assert len(dup) == 1


def test_histogram_quantiles_ignores_nulls(spark):
    """Regression: null values used to land in a null bin that the
    ascending window sorted FIRST, inflating every cumulative count."""
    vals = [(float(i),) for i in range(101)]
    clean = spark.createDataFrame(vals, "x double")
    dirty = spark.createDataFrame(vals + [(None,)] * 50, "x double")
    a = {r["q"]: r["value"]
         for r in histogram_quantiles(clean, "x", [0.5], 50).collect()}
    b = {r["q"]: r["value"]
         for r in histogram_quantiles(dirty, "x", [0.5], 50).collect()}
    assert a == b


def test_histogram_quantiles_grouped_and_degenerate(spark):
    df = spark.createDataFrame(
        [("g1", float(i)) for i in range(101)] + [("c", 7.0)] * 5,
        "g string, x double")
    got = {(r["g"], r["q"]): r["value"]
           for r in histogram_quantiles(df, "x", [0.5], 50,
                                        group_cols=["g"]).collect()}
    assert abs(got[("g1", 0.5)] - 50) <= 2.0
    assert got[("c", 0.5)] == 7.0  # constant group: zero-span guard
