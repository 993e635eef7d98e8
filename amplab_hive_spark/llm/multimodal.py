"""Multimodal (image/audio/video) column handling.

Beyond the reference surface (BASELINE.json north star): treat media
as opaque BINARY columns + typed metadata structs; decode /
feature-extract as Arrow-batched pandas iterators (mapInPandas).

The container ships no image/audio libraries, so the decode step is
a clearly-marked deterministic STUB (parse a fake header we synthesize
from the documents table). Everything around it — binary column
schema, metadata struct, mapInPandas batch shape, partition-preserving
plumbing — is real and is what matters at 100 TB: media bytes stay in
the executor-side Arrow batches, never collected, and per-batch
processing is O(batch) memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register

# Synthetic media payload: 8-byte header (2×int32 big-endian: width,
# height) + utf-8 body. Stands in for a real JPEG/WAV container.
_MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("body_tokens", LongType()),
    ]
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → fake media table (doc_id, media_type, payload:
    BINARY). Header dims derive deterministically from doc_id."""
    t = tables(spark, sf_dir)
    width = (F.col("doc_id") % 640 + 32).cast("int")
    height = (F.col("doc_id") % 480 + 24).cast("int")

    def be32(c):
        # big-endian int32 → 4 bytes via hex → unhex (JVM-side)
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    return t.documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.concat(be32(width), be32(height), F.encode("text", "utf-8")).alias("payload"),
    )


def decode_media_batch(iterator: Iterator) -> Iterator:
    """mapInPandas decoder STUB. A real implementation would call
    PIL/ffmpeg per Arrow batch here; this parses our synthetic
    header + body deterministically. NOTE: stub — do not ship as a
    real codec."""
    import struct

    for pdf in iterator:
        widths, heights, nbytes, tokens = [], [], [], []
        for payload in pdf["payload"]:
            raw = bytes(payload)
            w, h = struct.unpack(">ii", raw[:8])
            body = raw[8:].decode("utf-8")
            widths.append(w)
            heights.append(h)
            nbytes.append(len(raw))
            tokens.append(len(body.split(" ")))
        out = pdf[["doc_id", "media_type"]].copy()
        out["width"] = widths
        out["height"] = heights
        out["n_bytes"] = nbytes
        out["body_tokens"] = tokens
        yield out


@register(
    "multimodal_binary_stats",
    tags=("llm", "multimodal"),
    oracle="""
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       COUNT(*) AS n_assets,
       CAST(SUM(8 + octet_length(encode(text))) AS BIGINT) AS total_bytes,
       MIN(CAST(doc_id % 640 + 32 AS INT)) AS min_width,
       MAX(CAST(doc_id % 640 + 32 AS INT)) AS max_width
FROM documents
GROUP BY 1
ORDER BY media_type
""",
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column statistics via built-in expressions only
    (octet_length etc.) — storage accounting over opaque payloads
    without decoding. Stays fully JVM-side."""
    media = synthesize_media(spark, sf_dir)
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.octet_length("payload").cast("bigint")).alias("total_bytes"),
            F.min((F.col("doc_id") % 640 + 32).cast("int")).alias("min_width"),
            F.max((F.col("doc_id") % 640 + 32).cast("int")).alias("max_width"),
        )
        .orderBy("media_type")
    )


@register(
    "multimodal_decode_features",
    tags=("llm", "multimodal", "pandas-udf"),
    oracle="""
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       COUNT(*) AS n_decoded,
       CAST(SUM((doc_id % 640 + 32) * (doc_id % 480 + 24)) AS BIGINT) AS total_pixels,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY 1
ORDER BY media_type
""",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract through the Arrow/pandas batch path
    (mapInPandas): the real plumbing a media pipeline uses, with the
    codec stubbed (decode_media_batch). The oracle checks header
    round-trip (dims, token counts) — proving bytes→batch→struct
    integrity, not codec quality."""
    media = synthesize_media(spark, sf_dir)
    feats = media.mapInPandas(decode_media_batch, schema=_FEATURE_SCHEMA)
    return (
        feats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_decoded"),
            F.sum(F.col("width").cast("bigint") * F.col("height")).alias("total_pixels"),
            F.sum("body_tokens").alias("total_tokens"),
        )
        .orderBy("media_type")
    )
