"""extraction_diff: span-sequence regression comparison of two runs."""

import pytest
from pyspark.sql import functions as F

from vlm_ocr_doc_reader_spark.operators.regression import (
    extraction_diff, extraction_diff_summary)

SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
          "media_ref:string,offset:int>>")


def _span(kind, text, ref, off):
    return (kind, text, ref, off)


@pytest.fixture(scope="module")
def runs(spark):
    a = spark.createDataFrame([
        ("d1", [_span("text", "alpha", None, 0),
                _span("image", None, "img1", 1),
                _span("text", "beta", None, 2)]),
        ("d2", [_span("text", "same", None, 0)]),
        ("d3", [_span("text", "x", None, 0), _span("text", "y", None, 1)]),
        ("d4", [_span("text", "only in a", None, 0)]),
        ("d6", []),
    ], SCHEMA)
    b = spark.createDataFrame([
        # d1: identical sequence, offsets renumbered -> still equal
        ("d1", [_span("text", "alpha", None, 10),
                _span("image", None, "img1", 20),
                _span("text", "beta", None, 30)]),
        # d2: text changed at index 0
        ("d2", [_span("text", "changed", None, 0)]),
        # d3: second span missing -> length mismatch, first_diff = 1
        ("d3", [_span("text", "x", None, 0)]),
        # d5 only in b
        ("d5", [_span("text", "only in b", None, 0)]),
        ("d6", []),
    ], SCHEMA)
    return a, b


def test_diff_statuses(runs):
    a, b = runs
    out = {r["doc_id"]: r.asDict()
           for r in extraction_diff(a, b).collect()}
    assert out["d1"]["status"] == "equal" and out["d1"]["first_diff"] is None
    assert out["d2"]["status"] == "diverged" and out["d2"]["first_diff"] == 0
    assert out["d3"]["status"] == "diverged" and out["d3"]["first_diff"] == 1
    assert out["d3"]["n_a"] == 2 and out["d3"]["n_b"] == 1
    assert out["d4"]["status"] == "only_a" and out["d4"]["n_b"] is None
    assert out["d5"]["status"] == "only_b" and out["d5"]["n_a"] is None
    assert out["d6"]["status"] == "equal"  # empty == empty


def test_diff_null_media_ref_is_equal(runs, spark):
    # null media_ref on BOTH sides must compare equal (null-safe), and
    # null-vs-value must diverge
    a = spark.createDataFrame(
        [("d", [_span("image", None, None, 0)])], SCHEMA)
    b_same = spark.createDataFrame(
        [("d", [_span("image", None, None, 9)])], SCHEMA)
    b_ref = spark.createDataFrame(
        [("d", [_span("image", None, "r", 0)])], SCHEMA)
    assert extraction_diff(a, b_same).first()["status"] == "equal"
    assert extraction_diff(a, b_ref).first()["status"] == "diverged"


def test_diff_summary(runs):
    a, b = runs
    s = {r["status"]: r["n_docs"]
         for r in extraction_diff_summary(extraction_diff(a, b)).collect()}
    assert s == {"equal": 2, "diverged": 2, "only_a": 1, "only_b": 1}


def test_gate_entry_matches_duckdb(spark):
    import duckdb

    from vlm_ocr_doc_reader_spark.contract import (ORACLES,
                                                   q_extract_diff)
    sf = "/root/testdata/sf0.001"
    got = q_extract_diff(spark, sf).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(
        ORACLES["extract_diff"] + " ORDER BY doc_id").fetchdf()
    con.close()
    assert len(got) == len(want) > 0
    # the planted perturbations must actually appear
    assert (got.status == "diverged").sum() > 0
    assert (got.status == "equal").sum() > 0
    import pandas as pd
    for c in got.columns:
        g, w = got[c], want[c]
        assert str(g.dtype) == str(w.dtype), f"{c}: {g.dtype} vs {w.dtype}"
        both_na = g.isna() & w.isna()
        assert ((g == w) | both_na).all(), f"col {c} differs"


def test_cli_diff_command(spark, tmp_path):
    """End-to-end: extract the same corpus twice (self-diff all-equal),
    then against a perturbed copy (exactly the planted docs diverge)."""
    import pandas as pd

    from vlm_ocr_doc_reader_spark.cli import main
    from vlm_ocr_doc_reader_spark.fixtures.generate import (
        generate_documents, write_documents_parquet)

    inp = str(tmp_path / "in.parquet")
    write_documents_parquet(generate_documents(12, seed=5, mega_spans=50),
                            inp)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    assert main(["extract", "--input", inp, "--output", out_a,
                 "--state", str(tmp_path / "sa")]) == 0
    assert main(["extract", "--input", inp, "--output", out_b,
                 "--state", str(tmp_path / "sb")]) == 0

    d_out = str(tmp_path / "diff_ab")
    assert main(["diff", "--run-a", out_a, "--run-b", out_b,
                 "--output", d_out, "--summary"]) == 0
    diff = spark.read.parquet(d_out).toPandas()
    assert (diff.status == "equal").all() and len(diff) > 0

    # perturb one doc's spans in a copy of run B
    import glob
    frames = [pd.read_parquet(p) for p in glob.glob(f"{out_b}/*.parquet")]
    full = pd.concat(frames, ignore_index=True)
    victim = sorted(full.doc_id)[0]
    def _mutate(row):
        if row.doc_id == victim and len(row.spans):
            s = list(row.spans)
            s[0] = {**s[0], "text": "REGRESSED"}
            return s
        return row.spans
    full["spans"] = full.apply(_mutate, axis=1)
    out_c = tmp_path / "c"
    out_c.mkdir()
    full.to_parquet(out_c / "part.parquet", index=False)

    d_out2 = str(tmp_path / "diff_ac")
    assert main(["diff", "--run-a", out_a, "--run-b", str(out_c),
                 "--output", d_out2]) == 0
    diff2 = spark.read.parquet(d_out2).toPandas().set_index("doc_id")
    assert diff2.loc[victim, "status"] == "diverged"
    assert diff2.loc[victim, "first_diff"] == 0
    assert (diff2.drop(index=victim).status == "equal").all()


def test_diff_random_cases_match_python_reference(spark):
    """200 random span-array pairs (shared prefixes, mutations,
    insertions, deletions, null media_refs) diffed in one DataFrame,
    compared against a pure-Python reference verdict."""
    import random
    rng = random.Random(20260820)

    def rand_span(i):
        kind = rng.choice(["text", "image"])
        return (kind,
                None if kind == "image" else f"t{rng.randrange(5)}",
                f"m{rng.randrange(3)}" if kind == "image" else None,
                i)

    cases = {}
    rows_a, rows_b = [], []
    for c in range(200):
        doc = f"d{c}"
        a = [rand_span(i) for i in range(rng.randrange(0, 8))]
        op = rng.random()
        b = list(a)
        if op < 0.25 and a:                       # mutate one position
            i = rng.randrange(len(a))
            b[i] = ("text", "MUT", None, i)
        elif op < 0.45:                           # append
            b = b + [rand_span(len(b))]
        elif op < 0.65 and a:                     # drop one
            del b[rng.randrange(len(a))]
        # else identical
        rows_a.append((doc, a))
        rows_b.append((doc, b))
        cases[doc] = (a, b)
    a_df = spark.createDataFrame(rows_a, SCHEMA)
    b_df = spark.createDataFrame(rows_b, SCHEMA)
    got = {r["doc_id"]: r.asDict()
           for r in extraction_diff(a_df, b_df).collect()}

    def ref(a, b):
        ka = [(s[0], s[1], s[2]) for s in a]
        kb = [(s[0], s[1], s[2]) for s in b]
        fd = next((i for i in range(max(len(ka), len(kb)))
                   if i >= len(ka) or i >= len(kb) or ka[i] != kb[i]),
                  None)
        status = "equal" if fd is None else "diverged"
        return status, len(ka), len(kb), fd

    assert len(got) == len(cases)
    for doc, (a, b) in cases.items():
        status, na, nb, fd = ref(a, b)
        g = got[doc]
        assert (g["status"], g["n_a"], g["n_b"], g["first_diff"]) \
            == (status, na, nb, fd), doc
