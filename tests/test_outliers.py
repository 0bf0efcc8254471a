"""Robust (median/MAD) outlier detection (datapipe/outliers.py)."""

import pyspark.sql.functions as F

from vlm_ocr_doc_reader_spark.datapipe.outliers import robust_outliers


def test_robust_z_flags_spike_not_tail(spark):
    """One huge spike among tight values is flagged; the tight values are
    not — and unlike mean/std, the spike does not drag the center."""
    rows = [(i, "a", 100.0 + (i % 5)) for i in range(20)] + [(99, "a", 1e6)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = {r["id"]: (r["robust_z"], r["is_outlier"])
           for r in robust_outliers(df, "v", ["g"]).collect()}
    assert got[99][1] is True and abs(got[99][0]) > 1000
    assert all(not got[i][1] for i in range(20))
    flagged = robust_outliers(df, "v", ["g"], flagged_only=True).collect()
    assert [r["id"] for r in flagged] == [99]


def test_robust_z_degenerate_group_flags_nothing(spark):
    """MAD == 0 (majority identical values) must flag nothing — not
    everything — and yield null z."""
    rows = [(i, 5.0) for i in range(10)] + [(10, 6.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = robust_outliers(df, "v").collect()
    assert all(not r["is_outlier"] for r in got)
    assert all(r["robust_z"] is None for r in got)


def test_robust_z_null_values_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, None)], "id long, v double")
    got = robust_outliers(df, "v").collect()
    assert {r["id"] for r in got} == {1, 2, 3}
