"""Driver-comparator certification of the STAGED r7 gate entries.

The r6 registry and driver window are frozen (99 queries / 50-row
window), so the five composed monitors built this round —
``drift_report``, ``gopher_report``, ``url_report``,
``interleaved_report``, ``substring_dedup`` — ship as
``contract.STAGED_QUERIES`` / ``STAGED_ORACLES`` and are flipped into
the registry at the r7 front-load.  This test runs each staged pair
through the EXACT comparator the local gate uses
(``tools/check_contract.compare``: dtype-kind-strict, round-6 exact on
floats) at sf0.001, so the flip is a pure dict move with no new
certification risk.  The same pairs are runnable at any SF via
``python tools/check_contract.py <sf_dir> --staged``.
"""

import pathlib
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))

from check_contract import compare, duck_conn  # noqa: E402

from vlm_ocr_doc_reader_spark.contract import (STAGED_ORACLES,  # noqa: E402
                                               STAGED_QUERIES)

SF_DIR = "/root/testdata/sf0.001"


def test_staged_sets_aligned():
    assert set(STAGED_QUERIES) == set(STAGED_ORACLES)
    assert len(STAGED_QUERIES) == 11


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_pair_matches_oracle(spark, name):
    sdf = STAGED_QUERIES[name](spark, SF_DIR).toPandas()
    con = duck_conn(SF_DIR)
    try:
        ddf = con.execute(STAGED_ORACLES[name]).fetchdf()
    finally:
        con.close()
    assert len(sdf) > 0, f"{name}: staged query returned no rows"
    issues = compare(name, sdf, ddf)
    assert not issues, f"{name}: {issues}"
