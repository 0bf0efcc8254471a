"""F5/F6 parser parity with the reference
(/root/reference/02_src/vlm_ocr_doc_reader/core/ocr_client.py:103-171 and
its test suite test_core/test_ocr_client.py:112-210)."""

import pyspark.sql.functions as F

from vlm_ocr_doc_reader_spark.operators.parse import (parse_multi_task,
                                                      parse_single_expr)


def single(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    r = df.select(parse_single_expr(F.col("t")).alias("p")).collect()[0]["p"]
    return (r["status"], r["value"], r["context"], r["explanation"])


def test_single_full_block(spark):
    s, v, c, e = single(spark, "ЗНАЧЕНИЕ: 7704123456\n"
                               "КОНТЕКСТ: ИНН: 7704123456\n"
                               "ПОЯСНЕНИЕ: найдено в шапке")
    assert (s, v, c, e) == ("ok", "7704123456", "ИНН: 7704123456",
                            "найдено в шапке")


def test_single_no_data_variants(spark):
    for raw in ("ЗНАЧЕНИЕ: НЕТ", "ЗНАЧЕНИЕ: -", "ЗНАЧЕНИЕ:"):
        s, v, _, _ = single(spark, raw)
        assert (s, v) == ("no_data", ""), raw


def test_single_digit_fallback(spark):
    s, v, c, e = single(spark, "7704 123-456.")
    assert (s, v, e) == ("ok", "7704 123-456.", "fallback")
    # non-digit free text without ЗНАЧЕНИЕ -> no_data, not fallback
    s, v, _, _ = single(spark, "не могу распознать")
    assert (s, v) == ("no_data", "")


def test_single_multiline_value_stops_at_context(spark):
    s, v, c, _ = single(spark, "ЗНАЧЕНИЕ: a b\nc\nКОНТЕКСТ: ctx here")
    assert s == "ok" and v == "a b\nc" and c == "ctx here"


def _multi(spark, text, expected):
    df = spark.createDataFrame([(1, text, expected)],
                               "resp_id int, response string, expected int")
    rows = parse_multi_task(df, ["resp_id"]).orderBy("task_idx").collect()
    return [(r["task_idx"], r["status"], r["value"]) for r in rows]


def test_multi_aligned(spark):
    text = ("[ЗАДАЧА 1]\nЗНАЧЕНИЕ: 111111\n"
            "[ЗАДАЧА 2]\nЗНАЧЕНИЕ: НЕТ\n"
            "[ЗАДАЧА 3]\nЗНАЧЕНИЕ: 333333\n")
    assert _multi(spark, text, 3) == [
        (1, "ok", "111111"), (2, "no_data", ""), (3, "ok", "333333")]


def test_multi_missing_block_is_error(spark):
    text = "[ЗАДАЧА 1]\nЗНАЧЕНИЕ: 111111\n[ЗАДАЧА 3]\nЗНАЧЕНИЕ: 333333"
    got = _multi(spark, text, 3)
    assert got[0] == (1, "ok", "111111")
    assert got[1][:2] == (2, "error")
    assert got[2] == (3, "ok", "333333")


def test_multi_extra_blocks_ignored(spark):
    text = "[ЗАДАЧА 1]\nЗНАЧЕНИЕ: 1\n[ЗАДАЧА 9]\nЗНАЧЕНИЕ: 9"
    got = _multi(spark, text, 1)
    assert got == [(1, "ok", "1")]


def test_multi_duplicate_idx_last_wins(spark):
    text = "[ЗАДАЧА 1]\nЗНАЧЕНИЕ: old\n[ЗАДАЧА 1]\nЗНАЧЕНИЕ: new"
    got = _multi(spark, text, 1)
    assert got == [(1, "ok", "new")]


def test_multi_single_task_header_omitted_fallback(spark):
    got = _multi(spark, "ЗНАЧЕНИЕ: 42 42", 1)
    assert got == [(1, "ok", "42 42")]


def test_multi_empty_response_all_errors(spark):
    got = _multi(spark, "", 2)
    assert [g[:2] for g in got] == [(1, "error"), (2, "error")]


def test_multi_set_at_a_time(spark):
    rows = [(i, f"[ЗАДАЧА 1]\nЗНАЧЕНИЕ: {i}00000", 2) for i in range(30)]
    df = spark.createDataFrame(rows,
                               "resp_id int, response string, expected int")
    out = parse_multi_task(df, ["resp_id"])
    assert out.count() == 60
    assert out.filter("status = 'error'").count() == 30  # idx 2 missing
