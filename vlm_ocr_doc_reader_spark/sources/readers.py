"""Sources & sinks (SURVEY §2.1).

The reference's storage layer is a key-value workspace with PNG/JSON/YAML
typed keys (core/state.py:354-426); the engine's equivalents:

  * S1  PDF scan -> pages      => the input IS the span table already
                                  (input_hint); for raw binary landed files
                                  see ``read_binary_docs`` (binaryFile source)
  * S5/S6 state/registry sinks => parquet/Iceberg tables (manifest.py)
  * S9  state source           => ``read_documents`` with enforced schema
  * S11 content-hash identity  => sha2 over the serialized spans
  * S12 memory backend         => temp views (tests)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

SPAN_STRUCT = StructType([
    StructField("kind", StringType()),
    StructField("text", StringType()),
    StructField("media_ref", StringType()),
    StructField("offset", IntegerType()),
])
DOCUMENTS_SCHEMA = StructType([
    StructField("doc_id", StringType(), nullable=False),
    StructField("spans", ArrayType(SPAN_STRUCT)),
])

VALID_KINDS = ("text", "heading", "image", "table", "boilerplate", "link")


def read_documents(spark: SparkSession, path: str,
                   enforce: bool = True) -> DataFrame:
    """Read the judged input table with the schema pinned (never inferred —
    the reference re-validates at every deserialization boundary because its
    producer is an LLM, state.py:152-217; we enforce once at the source)."""
    df = spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)
    if enforce:
        df = df.filter(F.col("doc_id").isNotNull())
    return df


def quarantine_invalid_spans(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split exploded spans into (valid, quarantine): unknown/null kinds or
    null offsets go to the side-output (P5 quarantine pattern).

    The predicate is null-safe (coalesce to false): a NULL kind makes
    ``isin`` NULL, and filter(~NULL) would drop the row from BOTH outputs —
    the split must be lossless."""
    good = F.coalesce(
        F.col("kind").isin(*VALID_KINDS) & F.col("offset").isNotNull(),
        F.lit(False))
    return df.filter(good), df.filter(~good)


def with_content_hash(df: DataFrame) -> DataFrame:
    """S11/F10/T5: doc version identity = sha256 of the serialized spans;
    a changed document gets a new identity, so the manifest treats it as new
    work (decision_001:149-156)."""
    return df.withColumn(
        "content_hash", F.sha2(F.to_json(F.struct("doc_id", "spans")), 256))


def read_documents_json(spark: SparkSession, path: str,
                        enforce: bool = True) -> DataFrame:
    """JSON-lines variant of the judged input table — same pinned schema
    (never inferred), same null-id enforcement.  For corpora landed as
    JSONL exports rather than parquet; downstream plans are identical."""
    df = spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    if enforce:
        df = df.filter(F.col("doc_id").isNotNull())
    return df


def read_documents_orc(spark: SparkSession, path: str,
                       enforce: bool = True) -> DataFrame:
    """ORC variant of the judged input table (columnar alternative with the
    same pushdown/pruning properties as parquet)."""
    df = spark.read.schema(DOCUMENTS_SCHEMA).orc(path)
    if enforce:
        df = df.filter(F.col("doc_id").isNotNull())
    return df


def read_binary_docs(spark: SparkSession, path: str,
                     glob: str = "*.pdf") -> DataFrame:
    """S1 landing zone: raw files as (path, modificationTime, length,
    content).  Upstream block parsing (PDF -> spans) needs a PDF library not
    present in this container — consume the span table instead; this source
    exists so a cluster with the parser wired can land raw files."""
    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", glob)
            .load(path))


def register_memory_views(spark: SparkSession, frames: dict) -> None:
    """S12 memory backend analog: name -> DataFrame temp views for tests."""
    for name, df in frames.items():
        df.createOrReplaceTempView(name)
