"""Ordered funnel analysis (datapipe/funnel.py)."""

import pyspark.sql.functions as F
import pytest

from vlm_ocr_doc_reader_spark.datapipe.funnel import (funnel_report,
                                                      funnel_steps)


@pytest.fixture()
def events(spark):
    rows = [
        # u1: full ordered funnel
        (1, "view", 0), (1, "click", 5), (1, "purchase", 9),
        # u2: clicked BEFORE viewing -> click doesn't count; re-click never
        # happens, so stuck at step 1
        (2, "click", 1), (2, "view", 3),
        # u3: view then click, no purchase
        (3, "view", 2), (3, "click", 4),
        # u4: purchase only -> never entered the funnel (no view)
        (4, "purchase", 7),
    ]
    return spark.createDataFrame(
        [(u, t, f"2024-01-01 10:{m:02d}:00") for u, t, m in rows],
        "user_id long, event_type string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))


def test_funnel_steps_strict_ordering(events):
    got = {r["user"]: r["reached"]
           for r in funnel_steps(events,
                                 ["view", "click", "purchase"]).collect()}
    assert got == {1: 3, 2: 1, 3: 2}  # u4 absent: never reached step 1
    rows = {r["user"]: r for r in funnel_steps(
        events, ["view", "click", "purchase"]).collect()}
    assert rows[2]["t_2"] is None and rows[2]["t_3"] is None
    with pytest.raises(ValueError, match="at least 2"):
        funnel_steps(events, ["view"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_steps(events, ["view", "view"])


def test_funnel_report_conversion(events):
    rep = {r["step"]: (r["step_name"], r["n_users"], r["conversion"])
           for r in funnel_report(events,
                                  ["view", "click", "purchase"]).collect()}
    assert rep[1] == ("view", 3, 1.0)
    assert rep[2] == ("click", 2, round(2 / 3, 6))
    assert rep[3] == ("purchase", 1, round(1 / 3, 6))
