"""PII redaction + repetition statistics (datapipe/scrub.py)."""

from vlm_ocr_doc_reader_spark.datapipe.scrub import (redact_pii,
                                                     repetition_stats)


def test_redact_pii(spark):
    rows = [
        (1, "Mail a.b+c@test.org or call +7 916 123-45-67 now"),
        (2, "server at 192.168.0.1 and 10.0.0.2"),
        (3, "nothing sensitive here"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 1
    assert got[1]["redacted"] == "Mail <EMAIL> or call <PHONE> now"
    assert got[2]["n_ips"] == 2
    assert got[2]["redacted"] == "server at <IP> and <IP>"
    assert (got[3]["n_emails"], got[3]["n_ips"], got[3]["n_phones"]) \
        == (0, 0, 0)
    assert got[3]["redacted"] == "nothing sensitive here"
    assert got[4]["redacted"] == ""


def test_repetition_stats(spark):
    rows = [
        (1, "a a a b"),            # top=a(3)/4, distinct 2/4
        (2, "x y z"),              # all distinct
        (3, ""),                   # empty
        (4, "w  w\tw"),            # whitespace collapse -> w w w
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["id"]: r for r in repetition_stats(df).collect()}
    assert (got[1]["n_words"], got[1]["n_distinct"]) == (4, 2)
    assert abs(got[1]["dup_ratio"] - 0.5) < 1e-9
    assert abs(got[1]["top_word_ratio"] - 0.75) < 1e-9
    assert got[2]["dup_ratio"] == 0.0
    assert abs(got[2]["top_word_ratio"] - 1 / 3) < 1e-6
    assert (got[3]["n_words"], got[3]["dup_ratio"],
            got[3]["top_word_ratio"]) == (0, 0.0, 0.0)
    assert got[4]["top_word_ratio"] == 1.0


def test_repetition_no_exchange(spark):
    """The per-row fold must not shuffle."""
    df = spark.createDataFrame([(1, "a b a")], "doc_id int, text string")
    q = repetition_stats(df)
    p = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    assert "Exchange" not in p
