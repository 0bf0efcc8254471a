"""Cross-engine fuzz for the round-6 gate entries: run the REAL gate query
and its REAL DuckDB oracle over adversarial synthetic documents (trailing
'. ', repeated separators, whitespace runs, unicode, empty/one-word docs,
seeded word soup) far nastier than the gate corpus — so a testdata refresh
cannot silently break Spark/DuckDB split-semantics parity (the hazard class
behind the r4/r5 time_rollup incident, applied to the new text oracles)."""

import random

import duckdb
import pandas as pd
import pytest

from vlm_ocr_doc_reader_spark.contract import (ORACLES, q_bigram_lm,
                                               q_keyword_search,
                                               q_merge_shards,
                                               q_truncate_chunk)

ADVERSARIAL = [
    "",
    " ",
    "word",
    "ends with dot-space. ",
    "a. b. c. ",
    "double  spaces   and\ttabs\neverywhere here",
    ". leading separator",
    "a. . b. . ",
    "ünïcode wörds ünd spärk cafés naïve soufflé",
    "spark table join spark table join spark",
    "one enormously long sentence " + "token " * 150,
    ("many. tiny. sentences. " * 30) + "tail",
    "spark " * 40,
    "  ",
    "a.b no space after dot stays one sentence",
]


def _fuzz_docs(seed=13, n=60):
    rng = random.Random(seed)
    vocab = ["spark", "table", "join", "flange", "widget", "the", "a",
             "of", "naïve", "café", "x1", ""]
    rows = []
    for i, t in enumerate(ADVERSARIAL):
        rows.append((i, t))
    for i in range(len(ADVERSARIAL), n):
        n_sent = rng.randrange(0, 6)
        sents = [" ".join(rng.choice(vocab)
                          for _ in range(rng.randrange(0, 12)))
                 for _ in range(n_sent)]
        text = ". ".join(sents) + rng.choice(["", ". ", ".", " "])
        rows.append((i, text))
    return pd.DataFrame({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows],
        "lang": "en", "source": "fuzz",
        "n_chars": [len(r[1]) for r in rows],
    })


@pytest.fixture(scope="module")
def fuzz_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzzsf")
    _fuzz_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _duck(fuzz_sf, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{fuzz_sf}/documents.parquet')")
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    out = []
    for _, row in df.iterrows():
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(round(v, 6))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name,fn", [
    ("truncate_chunk", q_truncate_chunk),
    ("bigram_lm", q_bigram_lm),
    ("merge_shards", q_merge_shards),
    ("keyword_search", q_keyword_search),
])
def test_r6_oracle_parity_on_adversarial_text(spark, fuzz_sf, name, fn):
    got = fn(spark, fuzz_sf).toPandas()
    want = _duck(fuzz_sf, ORACLES[name])
    assert list(sorted(got.columns)) == list(sorted(want.columns))
    # driver-grade dtype-kind equality (int vs float is a FAIL)
    for c in got.columns:
        ka = str(got[c].dtype)
        kb = str(want[c].dtype)
        same_kind = (("int" in ka.lower()) == ("int" in kb.lower())
                     and ("float" in ka) == ("float" in kb))
        assert same_kind, f"{name}.{c}: {ka} vs {kb}"
    assert _canon(got) == _canon(want), name
