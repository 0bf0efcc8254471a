"""As-of join (datapipe/asof.py): hand-computed matches, inclusive equal-ts
semantics, no-match nulls, and the one-exchange/no-range-join plan shape."""

import re

from vlm_ocr_doc_reader_spark.datapipe.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", 10, "a"), (2, "u1", 20, "b"), (3, "u1", 5, "c"),
         (4, "u2", 50, "d"), (5, "u3", 9, "e")],
        "event_id int, k string, ts int, payload string")
    right = spark.createDataFrame(
        [("u1", 10, 100.0), ("u1", 15, 150.0), ("u2", 60, 600.0)],
        "k string, ts int, w double")
    return left, right


def test_asof_join_hand_computed(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: r["asof_w"]
           for r in asof_join(left, right, on=["k"], ts_col="ts",
                              value_cols=["w"]).collect()}
    assert out == {
        1: 100.0,   # equal ts is inclusive (backward asof)
        2: 150.0,   # latest of {10, 15} <= 20
        3: None,    # before any right row
        4: None,    # right row exists but only at ts 60 > 50
        5: None,    # key with no right rows at all
    }


def test_asof_join_null_right_values(spark):
    """A latest-match right row whose value is NULL must yield NULL (not an
    older non-null value), and multiple value columns must all come from
    that same right row — DuckDB/pandas ASOF semantics with NULLs."""
    left = spark.createDataFrame([(1, "u1", 12), (2, "u1", 7)],
                                 "event_id int, k string, ts int")
    right = spark.createDataFrame(
        [("u1", 5, 99.0, "A"), ("u1", 10, None, "B")],
        "k string, ts int, w double, tag string")
    out = {r["event_id"]: (r["asof_w"], r["asof_tag"])
           for r in asof_join(left, right, on=["k"], ts_col="ts",
                              value_cols=["w", "tag"]).collect()}
    # ts=12 matches the ts=10 row: w is genuinely NULL there, tag is 'B' —
    # both from that one row (NOT w=99.0 carried from ts=5)
    assert out[1] == (None, "B")
    assert out[2] == (99.0, "A")

    # DuckDB native ASOF agrees
    import duckdb
    con = duckdb.connect()
    got = con.execute("""
        SELECT l.event_id, r.w, r.tag
        FROM (VALUES (1, 'u1', 12), (2, 'u1', 7)) l(event_id, k, ts)
        ASOF LEFT JOIN (VALUES ('u1', 5, 99.0, 'A'),
                               ('u1', 10, NULL, 'B')) r(k, ts, w, tag)
        ON l.k = r.k AND l.ts >= r.ts
    """).fetchall()
    assert {(e, (w, t)) for e, w, t in got} == set(out.items())


def test_asof_join_plan_shape(spark):
    left, right = _frames(spark)
    q = asof_join(left, right, on=["k"], ts_col="ts", value_cols=["w"])
    p = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    # union-and-carry: a window, exactly one hash exchange, and NO join
    # operator at all (a range/theta join would explode on hot keys)
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE)) == 1
    assert "Join" not in p
    assert "Window" in p
