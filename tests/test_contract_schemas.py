"""Every driver-contract query must return a FLAT frame: the gate
canonicalizer sorts/hashes pandas columns, and array/struct/map cells are
unhashable (the exact failure mode of round 1's extract_pipeline entry).
Schema-only check — no jobs run, so it covers all 54 queries in seconds."""

from pyspark.sql.types import ArrayType, MapType, StructType

from vlm_ocr_doc_reader_spark.contract import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


def test_every_query_is_flat_and_oracled(spark):
    assert set(QUERIES) == set(ORACLES), (
        "every query needs an oracle (no rows-only entries)")
    bad = []
    for name, fn in QUERIES.items():
        schema = fn(spark, SF).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"nested columns would break the gate canonicalizer: {bad}"
