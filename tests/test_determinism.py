"""Partition-invariance of every float-aggregating gate query.

The round-4 driver caught `time_rollup` flipping a rounding boundary when a
repartition changed the partial-sum order of a double aggregation
(CORRECTNESS_r04: hash_match false, local runs green).  The fix is exact
decimal accumulation (associative, order-invariant) in both the Spark query
and the DuckDB oracle; this suite pins the property for the whole hazard
class: each query below must produce BYTE-IDENTICAL canonical output no
matter how the input is partitioned.
"""

from __future__ import annotations

import os

import pytest

from vlm_ocr_doc_reader_spark import contract

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# every gate query whose output hashes an aggregate of a double column
FLOAT_AGG_QUERIES = [
    "pricing_summary",
    "dim_join_rollup",
    "sessionize",
    "windowed_counts",
    "time_rollup",
    "rollup_cube",
    "lm_score",
    "corpus_report",
    # round-5 additions with decimal-accumulated float aggregates
    "bm25",
    "decayed_sum",
    "winsorize",
    "rolling_stats",
    # quantile-boundary bucketing must also be partition-invariant
    "curriculum",
]


def _canonical(df) -> list[tuple]:
    """Driver-shaped canonical form: columns sorted by name, floats rounded
    to 6 decimals and stringified (repr is exact for doubles), rows sorted.
    Any partial-sum reorder that moves a value at all shows up here."""
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for rec in pdf.itertuples(index=False):
        rows.append(tuple(
            repr(round(v, 6)) if isinstance(v, float) else str(v)
            for v in rec))
    return sorted(rows)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no driver testdata")
@pytest.mark.parametrize("name", FLOAT_AGG_QUERIES)
def test_partition_invariant(spark, name):
    fn = contract.QUERIES[name]
    results = {}
    try:
        for n_parts in (1, 7):
            contract.LOAD_REPARTITION = n_parts
            results[n_parts] = _canonical(fn(spark, SF_DIR))
    finally:
        contract.LOAD_REPARTITION = None
    assert results[1] == results[7], (
        f"{name}: output depends on input partitioning")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no driver testdata")
def test_time_rollup_three_way(spark):
    """The r4 failure case gets the full treatment: 1 / 8 / 32 partitions,
    identical canonical output each way."""
    fn = contract.QUERIES["time_rollup"]
    outs = []
    try:
        for n_parts in (1, 8, 32):
            contract.LOAD_REPARTITION = n_parts
            outs.append(_canonical(fn(spark, SF_DIR)))
    finally:
        contract.LOAD_REPARTITION = None
    assert outs[0] == outs[1] == outs[2]


R7_FLIPPED_FLOAT_QUERIES = [
    # r7-flipped entries with float outputs: semantic cosines (semdedup),
    # decimal-accumulated log-weights + gumbel keys (dsir_select),
    # decimal phrase-score sums (rake), rank-derived rrf
    "semdedup",
    "dsir_select",
    "rake",
    "hybrid_search",
]


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no driver testdata")
@pytest.mark.parametrize("name", R7_FLIPPED_FLOAT_QUERIES)
def test_r7_flipped_partition_invariant(spark, name):
    fn = contract.QUERIES[name]
    results = {}
    try:
        for n_parts in (1, 7):
            contract.LOAD_REPARTITION = n_parts
            results[n_parts] = _canonical(fn(spark, SF_DIR))
    finally:
        contract.LOAD_REPARTITION = None
    assert results[1] == results[7], (
        f"{name}: output depends on input partitioning")
