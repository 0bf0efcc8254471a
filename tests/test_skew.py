"""Salted skew-join == plain join, with the hot key spread across salts."""

import pyspark.sql.functions as F
import pytest

from vlm_ocr_doc_reader_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # 90% of the big side hits one hot key
    big = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
         .cast("long").alias("k"),
        F.col("id").alias("payload"))
    small = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("dim_"), F.col("id")).alias("name"))

    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k", n_salts=8) \
        .select("k", "payload", "name")
    assert salted.count() == plain.count() == 20000
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_join_rejects_outer_and_handles_null_rows(spark):
    big = spark.createDataFrame(
        [(7, "x"), (None, None), (7, None)], "k int, payload string")
    small = spark.createDataFrame([(7, "dim")], "k int, name string")
    # right/full outer would replicate unmatched small rows n_salts times
    with pytest.raises(ValueError):
        salted_join(big, small, "k", how="full_outer")
    # rows with NULLs must not vanish: struct-hash salt is never NULL
    got = salted_join(big, small, "k").select("k", "payload", "name") \
        .collect()
    assert sorted((r["k"], r["payload"] or "") for r in got) == [(7, ""),
                                                                 (7, "x")]
    left = salted_join(big, small, "k", how="left")
    assert left.count() == 3          # big side fully preserved


def test_salt_actually_spreads_hot_key(spark):
    big = spark.range(0, 5000).select(F.lit(7).alias("k"),
                                      F.col("id").alias("payload"))
    from pyspark.sql.functions import pmod, xxhash64, lit
    salts = big.withColumn(
        "_salt", pmod(xxhash64("k", "payload"), lit(8)).cast("int")) \
        .groupBy("_salt").count().collect()
    assert len(salts) == 8            # all 8 buckets used
    assert max(r["count"] for r in salts) < 5000 * 0.3   # no bucket dominates
