"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's media channel is PNG page images rendered from PDFs
(preprocessing/renderer.py:35-96) and shipped to a VLM.  The engine treats
media as ``binary`` payload columns with a typed metadata struct, processed
by Arrow-batched ``mapInPandas`` UDFs.  The actual decode (PIL/ffmpeg) is
NOT available in this container, so the decode kernel is stubbed behind a
clearly-marked ``NotImplementedError`` with a deterministic fake for tests —
the Spark-side plumbing (schema, partitioning, UDF signature, batch shape)
is real and tested.

Schema:
  media(doc_id string, media_ref string, media_type string,  -- image|audio|video
        payload binary, meta struct<width int, height int, duration_ms int,
        format string>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("media_ref", StringType()),
    StructField("media_type", StringType()),
    StructField("payload", BinaryType()),
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("format", StringType()),
    ])),
])

FEATURE_SCHEMA = ("doc_id string, media_ref string, media_type string, "
                  "payload_sha256 string, payload_bytes long, "
                  "feat0 double, feat1 double, feat2 double, feat3 double")


def decode_image(payload: bytes) -> "object":
    """Real decode needs PIL — not in this container.  STUB."""
    raise NotImplementedError(
        "image decode requires PIL/opencv, not available in this container; "
        "wire a real decoder here on a cluster image that ships one")


def _fake_features(payload: bytes, n: int = 4) -> list[float]:
    """Deterministic stand-in for a decoded-feature extractor: bytes of the
    sha256 digest scaled to [0,1).  Replaces decode_image in tests."""
    d = hashlib.sha256(payload or b"").digest()
    return [d[i] / 256.0 for i in range(n)]


def extract_media_features(media: DataFrame,
                           use_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    Runs as ``mapInPandas`` — one pandas batch in, one out; no per-row Python
    UDF.  At scale, media rows are large (binary payloads), so
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory and
    the scan should prune ``payload`` until this operator actually runs.
    """
    if not use_stub:
        decode_image(b"")  # raises NotImplementedError with guidance

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            feats = [_fake_features(p) for p in payloads]
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "media_type": pdf["media_type"],
                "payload_sha256": [
                    hashlib.sha256(p or b"").hexdigest() for p in payloads],
                "payload_bytes": [len(p or b"") for p in payloads],
            })
            for i in range(4):
                out[f"feat{i}"] = [f[i] for f in feats]
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_media(media: DataFrame, width: int, height: int,
                 use_stub: bool = True) -> DataFrame:
    """Arrow-batched image resize over the media table: same schema out,
    payload replaced by the resized encoding and ``meta.width/height``
    updated.  The decode->resize->encode kernel needs PIL (absent here), so
    the stub emits a deterministic sha256(payload | WxH) digest payload —
    the Spark plumbing (mapInPandas batches, struct-column rebuild, schema)
    is real and tested; swap ``_stub_resize`` for a PIL kernel on a cluster
    image that ships one.
    """
    if not use_stub:
        decode_image(b"")  # raises NotImplementedError with guidance

    def _stub_resize(payload: bytes) -> bytes:
        return hashlib.sha256(
            (payload or b"") + f"|{width}x{height}".encode()).digest()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = [_stub_resize(p) for p in pdf["payload"]]
            out["meta"] = [
                {**(m or {}), "width": width, "height": height}
                for m in pdf["meta"]]
            yield out

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame timestamp to decode.
    The decode itself is the stubbed kernel; the plan is pure Catalyst
    (sequence + explode) and is where partition fan-out happens at scale."""
    n_frames = F.greatest(
        F.lit(1),
        F.floor(F.col("meta.duration_ms") / every_ms).cast("int"))
    return (media.filter(F.col("media_type") == "video")
            .select("doc_id", "media_ref",
                    F.explode(F.sequence(F.lit(0), n_frames - 1))
                     .alias("frame_idx"))
            .withColumn("ts_ms", F.col("frame_idx") * every_ms))
