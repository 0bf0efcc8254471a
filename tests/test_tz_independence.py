"""Driver-environment timezone independence for the epoch-emitting gate
queries (round-6 brief item: nothing in the contract pins the DRIVER's
session timezone — one environment change would redden every time query at
once).  `contract.load()` now pins ``spark.sql.session.timeZone`` to UTC on
whatever session it is handed; these tests prove each time-bucketing query
returns byte-identical rows when the ambient session default is
America/New_York (UTC-4/-5 — an offset that shifts both date_trunc buckets
and unix_timestamp epochs if unpinned).
"""

import pytest

from vlm_ocr_doc_reader_spark.contract import QUERIES

SF = "/root/testdata/sf0.001"

TIME_QUERIES = ["time_rollup", "windowed_counts", "sessionize", "scd2",
                "rolling_stats"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", TIME_QUERIES)
def test_time_query_identical_under_nonutc_session(spark, name):
    fn = QUERIES[name]
    utc_rows = _rows(fn(spark, SF))
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ny_rows = _rows(fn(spark, SF))
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert ny_rows == utc_rows, (
        f"{name} output depends on the ambient session timezone — "
        f"load()'s UTC pin is not reaching this query's expressions")


def test_load_pins_session_timezone(spark):
    """load() must reset a non-UTC ambient session back to UTC before any
    plan is constructed.  Measured behavior on pyspark 4.1.2 (verified with
    both a non-UTC session conf and a non-UTC TZ env at JVM start):
    unix_timestamp over TIMESTAMP_NTZ is already session-TZ-invariant, so
    the pin is currently pure insurance — it defends against (a) a future
    Spark changing NTZ epoch semantics, (b) any table gaining a true
    TIMESTAMP (LTZ) column, and (c) string<->timestamp casts in future
    queries, all of which DO read the session zone."""
    from vlm_ocr_doc_reader_spark.contract import load

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        load(spark, SF, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
