"""Multimodal columns: image/audio/video as opaque ``binary`` + metadata.

The Spark-side plumbing is real and tested: binary payload column, typed
metadata struct, Arrow-batched ``mapInPandas`` feature extraction with an
explicit output schema, and batch-shape-preserving iteration. The actual
codec work (JPEG decode, audio resample, video frame-sample) is STUBBED —
the image/audio libraries are not in this container — behind
``try_import``-gated functions that raise ``NotImplementedError`` with a
clear message, plus a deterministic fake used by the registered query so
the pipeline is verifiable end-to-end (against a DuckDB oracle, since the
fake features are pure functions of the bytes).

At 100 TB: payloads stay columnar in parquet; ``mapInPandas`` streams
Arrow record batches so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads; feature
extraction is a narrow map — zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, payload_md5 string, "
    "fake_width int, fake_height int"
)


def decode_image(payload: bytes) -> "object":
    """Real decode path — stubbed (no PIL/opencv in this container)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires pillow; container ships without codecs — "
            "use extract_fake_features for the tested plumbing path"
        ) from exc
    raise NotImplementedError("wire Image.open(io.BytesIO(payload)) here")


def extract_fake_features(batches: Iterator) -> Iterator:
    """Deterministic stand-in for codec feature extraction: byte length,
    md5, and fake dimensions derived from the payload bytes. Exercises the
    exact UDF signature/batch shape a real decoder would use."""
    import hashlib

    import pandas as pd

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(len).astype("int64"),
                "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "fake_width": (payloads.map(len) % 640).astype("int32"),
                "fake_height": (payloads.map(len) % 480).astype("int32"),
            }
        )


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal table: documents' utf8 bytes as the opaque
    payload + a typed metadata struct (what an image/audio ingest would
    produce)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/jpeg")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").alias("content_length"),
            F.col("lang").alias("language"),
        ).alias("meta"),
    )


_QMEDIA_ORACLE = """
SELECT
  doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
       WHEN doc_id % 3 = 1 THEN 'audio/wav'
       ELSE 'video/mp4' END                    AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT)   AS n_bytes,
  md5(text)                                    AS payload_md5,
  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
  CAST(octet_length(encode(text)) % 480 AS INTEGER) AS fake_height
FROM documents
"""


@register(
    "q_multimodal_decode",
    oracle=_QMEDIA_ORACLE,
    description="binary payload column -> mapInPandas feature extraction (stub codec)",
    tags=("multimodal", "binary", "mapInPandas"),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_frame(spark, sf_dir).select("doc_id", "payload", "media_type")
    return media.mapInPandas(extract_fake_features, schema=_FEATURE_SCHEMA)
