"""Cross-engine fuzz over the live registry's regex surface — built
around the one character where the two engines' regex whitespace
classes actually DIVERGE: Java's ``\\s`` matches ``\\x0B`` (vertical
tab), DuckDB's RE2 ``\\s`` does not (measured r6; ``\\w``/``\\b``/
``\\d`` are identical).  The r7 sweep (VERDICT r6 item 3) spelled the
Java class out explicitly in every window-entry oracle owned outright
by a window entry; this suite runs those swept entries on a corpus
saturated with ``\\x0B`` and every other whitespace variant and
requires EXACT oracle parity — text the bare-``\\s`` form provably
diverges on (witness test below).  Frozen r6-green oracles and shared
helpers keep bare ``\\s`` and are exonerated by the gate-table
``\\x0B`` pin in test_contract_schemas instead.
"""

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vlm_ocr_doc_reader_spark.contract import ORACLES, QUERIES

ADVERSARIAL = [
    "",
    " ",
    "plain words here",
    "vertical\x0btab between words",
    "\x0bleading vtab",
    "trailing vtab\x0b",
    "mixed \t tab \x0b vtab \f feed \r cr \n nl runs",
    "\x0b\x0b\x0b",
    "- bullet\x0bline starts after dash",
    "1. numbered then\x0bvtab",
    "word\x0b42\x0bword",
    "ünïcode\x0bwörds",
    "the of and to in a\x0bthe",          # stopwords around vtab
    "deep neural network\x0bdeep neural network",
]


def _fuzz_docs(seed=29, n=80):
    rng = random.Random(seed)
    vocab = ["spark", "table", "join", "the", "a", "of", "vector",
             "engine", "x1", "café"]
    rows = []
    for i, t in enumerate(ADVERSARIAL):
        rows.append((i, t, "en" if i % 2 == 0 else "xx"))
    for i in range(len(ADVERSARIAL), n):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(0, 20))]
        # sprinkle every whitespace variant as separators
        seps = [rng.choice([" ", "  ", "\t", "\x0b", "\n", "\f", "\r"])
                for _ in toks]
        text = "".join(t + s for t, s in zip(toks, seps))
        rows.append((i, text, "en" if rng.random() < 0.5 else "xx"))
    return pd.DataFrame({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows],
        "lang": [r[2] for r in rows],
        "source": "fuzz",
        "n_chars": [len(r[1]) for r in rows],
    })


@pytest.fixture(scope="module")
def fuzz_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("stagedfuzz")
    _fuzz_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _duck(fuzz_sf, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{fuzz_sf}/documents.parquet')")
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


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


# Window entries whose oracle regex surface is FULLY explicit-class
# after the r7 sweep and that read only the documents table (the fuzz
# corpus).  Entries embedding frozen bare-\s helpers (corpus_report,
# simhash, containment, incremental_dedup, bm25) are excluded by
# design — the gate-table pin covers them.
SWEPT_DOC_ENTRIES = [
    "rake", "dsir_select", "gopher_report",
    "quality_clf", "corpus_diff", "density_classify", "passage_dedup",
    "lm_score", "bigram_pmi", "bpe_pairs",
    "extract_strategies", "levels_suite",
]


@pytest.mark.parametrize("name", SWEPT_DOC_ENTRIES)
def test_swept_oracle_parity_on_vtab_text(spark, fuzz_sf, name):
    got = QUERIES[name](spark, fuzz_sf).toPandas()
    want = _duck(fuzz_sf, ORACLES[name])
    assert list(sorted(got.columns)) == list(sorted(want.columns))
    for c in got.columns:
        ka, kb = str(got[c].dtype), str(want[c].dtype)
        same_kind = (("int" in ka.lower()) == ("int" in kb.lower())
                     and ("float" in ka) == ("float" in kb))
        assert same_kind, f"{name}.{c}: {ka} vs {kb}"
    assert _canon(got) == _canon(want), name


def test_vtab_actually_diverges_under_bare_s(spark, fuzz_sf):
    """Regression witness: the bare-\\s oracle form WOULD diverge on
    this corpus (this is why the explicit class exists).  If this test
    ever fails, the engines' regex classes converged and the r7 sweep
    note can be retired."""
    duck_tokens = _duck(fuzz_sf, r"""
        SELECT len(list_filter(string_split(lower(regexp_replace(
          trim(text), '\s+', ' ', 'g')), ' '), x -> x <> '')) AS n
        FROM documents WHERE doc_id = 3""").iloc[0, 0]
    spark_tokens = (
        spark.read.parquet(f"{fuzz_sf}/documents.parquet")
        .filter(F.col("doc_id") == 3)
        .select(F.size(F.filter(
            F.split(F.lower(F.regexp_replace(F.trim("text"),
                                             r"\s+", " ")), " "),
            lambda x: x != ""))).collect()[0][0])
    assert duck_tokens != spark_tokens  # 3 vs 4 on 'vertical\x0btab ...'
