"""Training-set assembly: deterministic epoch shuffle, sequence packing,
mixture sampling (datapipe/assembly.py)."""

import pyspark.sql.functions as F
import pytest

from vlm_ocr_doc_reader_spark.datapipe.assembly import (epoch_key,
                                                        mixture_rates,
                                                        mixture_sample,
                                                        pack_sequences)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word "), F.repeat(F.lit("tok "), (F.col("id") % 37
                                                          + 1).cast("int")))
        .alias("text"))


def test_pack_sequences_is_contiguous_and_budgeted(spark):
    out = pack_sequences(_docs(spark), token_budget=64, n_streams=4,
                         seed=0).collect()
    assert len(out) == 200
    for r in out:
        assert 0 <= r["seq_offset"] < 64  # doc STARTS inside its sequence
    # per stream: sorting by (seq_id, seq_offset) must tile token counts
    # contiguously (offset_{i+1} == (offset_i + n_tokens_i) mod-budget walk)
    by_stream = {}
    for r in out:
        by_stream.setdefault(r["stream"], []).append(r)
    for rows in by_stream.values():
        rows.sort(key=lambda r: (r["seq_id"], r["seq_offset"]))
        pre = 0
        for r in rows:
            assert r["seq_id"] == pre // 64
            assert r["seq_offset"] == pre - (pre // 64) * 64
            pre += r["n_tokens"]


def test_pack_sequences_repartition_stable_and_seeded(spark):
    docs = _docs(spark)
    a = {r["id"]: (r["stream"], r["seq_id"], r["seq_offset"])
         for r in pack_sequences(docs, 64, n_streams=4, seed=0).collect()}
    b = {r["id"]: (r["stream"], r["seq_id"], r["seq_offset"])
         for r in pack_sequences(docs.repartition(13), 64, n_streams=4,
                                 seed=0).collect()}
    assert a == b  # pure function of (seed, id), not partition layout
    c = {r["id"]: (r["stream"], r["seq_id"], r["seq_offset"])
         for r in pack_sequences(docs, 64, n_streams=4, seed=1).collect()}
    assert a != c  # a new seed is a new epoch order


def test_mixture_rates_downsamples_to_binding_source():
    rates = mixture_rates({"web": 1000, "code": 100},
                          {"web": 0.5, "code": 0.5})
    # code is binding (100 tokens must be half the mix): kept whole,
    # web downsampled to 100 of its 1000
    assert rates["code"] == 1.0
    assert abs(rates["web"] - 0.1) < 1e-12
    with pytest.raises(ValueError, match="no token counts"):
        mixture_rates({"web": 10}, {"web": 0.5, "missing": 0.5})
    with pytest.raises(ValueError, match="infeasible"):
        mixture_rates({"web": 10, "code": 0}, {"web": 0.5, "code": 0.5})


def test_mixture_sample_deterministic_and_drops_unlisted(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else ("b" if i % 3 == 0 else "junk"))
         for i in range(600)], "doc_id long, source string")
    rates = {"a": 1.0, "b": 0.5}
    got1 = {r["doc_id"] for r in mixture_sample(df, rates).collect()}
    got2 = {r["doc_id"] for r in
            mixture_sample(df.repartition(7), rates).collect()}
    assert got1 == got2
    srcs = {r["source"] for r in mixture_sample(df, rates).collect()}
    assert "junk" not in srcs
    n_a = len([i for i in got1 if i % 2 == 0])
    assert n_a == 300  # rate 1.0 keeps every 'a'


def test_epoch_key_varies_with_seed(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"),
                               epoch_key(seed=0).alias("k0"),
                               epoch_key(seed=1).alias("k1"))
    rows = df.collect()
    assert all(r["k0"] != r["k1"] for r in rows)


def test_chunk_text_overlap_and_tail(spark):
    from vlm_ocr_doc_reader_spark.datapipe.assembly import chunk_text
    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, words), (2, "a b"), (3, "")],
                               "doc_id long, text string")
    out = [r for r in chunk_text(df, chunk_tokens=4, overlap=2)
           .orderBy("id", "chunk_idx").collect()]
    d1 = [r for r in out if r["id"] == 1]
    # starts every 2 tokens: 0,2,4,6 (stop once start > n - overlap)
    assert [r["start_tok"] for r in d1] == [0, 2, 4, 6]
    assert d1[0]["chunk"] == "w0 w1 w2 w3"
    assert d1[1]["chunk"] == "w2 w3 w4 w5"
    # every adjacent pair shares exactly `overlap` tokens
    for a, b in zip(d1, d1[1:]):
        assert a["chunk"].split()[-2:] == b["chunk"].split()[:2]
    # tail chunk keeps the remainder; nothing is lost
    assert d1[-1]["chunk"] == "w6 w7 w8 w9"
    covered = set()
    for r in d1:
        covered.update(r["chunk"].split())
    assert covered == set(words.split())
    # short doc -> one partial chunk; empty doc -> nothing
    d2 = [r for r in out if r["id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk"] == "a b" and d2[0]["n_tokens"] == 2
    assert not [r for r in out if r["id"] == 3]


def test_chunk_text_rejects_bad_overlap(spark):
    import pytest

    from vlm_ocr_doc_reader_spark.datapipe.assembly import chunk_text
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_text(df, chunk_tokens=4, overlap=4)
