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
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register

# Synthetic media payload: 8-byte header (2×int32 big-endian: width,
# height) + utf-8 body. Stands in for a real JPEG/WAV container;
# synthesize_media builds rows of (doc_id, media_type, payload).

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


# --- frame sampling (round 4) --------------------------------------
# Synthetic "video" container: 4-byte big-endian frame count, then
# n 16-byte frames; frame i's bytes are unhex(md5("{doc_id}_{i}")) —
# deterministic, so an analytic oracle can verify that the Spark-side
# BINARY SLICING (the real plumbing) extracted exactly the right
# bytes without itself parsing any binary.

_FRAME_BYTES = 16
_FRAME_STEP = 4  # sample every 4th frame

_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hex", StringType()),
        StructField("n_frames", IntegerType()),
    ]
)


def synthesize_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload) with n_frames = doc_id % 24 + 8 frames.
    Payload assembled JVM-side: header + fold-concat of per-frame
    md5 blocks."""
    t = tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.expr(
            """
aggregate(
  sequence(0, CAST(doc_id % 24 + 7 AS INT)),
  unhex(lpad(hex(CAST(doc_id % 24 + 8 AS INT)), 8, '0')),
  (acc, i) -> concat(acc, unhex(md5(concat(CAST(doc_id AS STRING), '_', CAST(i AS STRING)))))
)
"""
        ).alias("payload"),
    )


def sample_frames_batch(iterator: Iterator) -> Iterator:
    """mapInPandas frame sampler: parse the frame count from the
    header, slice every ``_FRAME_STEP``-th 16-byte frame out of the
    payload, emit its hex. This is the real batch shape a video
    pipeline uses (ffmpeg keyframe extraction per Arrow batch) with
    the codec replaced by fixed-size frames."""
    import struct

    import pandas as pd

    for pdf in iterator:
        ids, idxs, hexes, counts = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            (n,) = struct.unpack(">i", raw[:4])
            for i in range(0, n, _FRAME_STEP):
                start = 4 + i * _FRAME_BYTES
                ids.append(doc_id)
                idxs.append(i)
                hexes.append(raw[start : start + _FRAME_BYTES].hex())
                counts.append(n)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_hex": pd.Series(hexes, dtype="object"),
                "n_frames": pd.Series(counts, dtype="int32"),
            }
        )


@register(
    "multimodal_frame_sample",
    tags=("llm", "multimodal", "pandas-udf"),
    oracle=f"""
SELECT doc_id,
       CAST(i.i AS INT) AS frame_idx,
       md5(doc_id::VARCHAR || '_' || i.i::VARCHAR) AS frame_hex,
       CAST(doc_id % 24 + 8 AS INT) AS n_frames
FROM documents, (SELECT unnest(range(0, 32)) AS i) i
WHERE i.i < doc_id % 24 + 8 AND i.i % {_FRAME_STEP} = 0
ORDER BY doc_id, frame_idx
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary video payloads: every 4th frame
    sliced out of the container in Arrow batches. The oracle
    recomputes each sampled frame's bytes ANALYTICALLY (the synthetic
    frame formula), so a slicing bug — off-by-one offsets, header
    miscount, byte order — fails the hash compare. Scale shape: the
    payload bytes never leave the executor; output carries only
    (doc_id, idx, 32-hex digest) per sampled frame."""
    video = synthesize_video(spark, sf_dir)
    return (
        video.mapInPandas(sample_frames_batch, schema=_FRAME_SCHEMA)
        .orderBy("doc_id", "frame_idx")
    )


@register(
    "multimodal_resize_audit",
    tags=("llm", "multimodal"),
    oracle="""
SELECT doc_id,
       CAST(doc_id % 640 + 32 AS INT) AS old_w,
       CAST(doc_id % 480 + 24 AS INT) AS old_h,
       64 AS new_w,
       CAST(floor((doc_id % 480 + 24) * 64.0 / (doc_id % 640 + 32)) AS INT) AS new_h,
       CAST(8 + 64 * floor((doc_id % 480 + 24) * 64.0 / (doc_id % 640 + 32)) AS BIGINT) AS new_bytes
FROM documents
WHERE doc_id % 7 = 0
ORDER BY doc_id
""",
)
def multimodal_resize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning over the media table: target width 64,
    aspect-preserving height, 1 byte/pixel payload estimate — the
    metadata side of a resize operator (the pixel resample itself is
    the stubbed codec; see decode_media_batch). Pure projection, no
    Python, zero shuffle."""
    media = synthesize_media(spark, sf_dir).filter(F.col("doc_id") % 7 == 0)
    old_w = (F.col("doc_id") % 640 + 32).cast("int")
    old_h = (F.col("doc_id") % 480 + 24).cast("int")
    new_h = F.floor(old_h * 64.0 / old_w).cast("int")
    return media.select(
        "doc_id",
        old_w.alias("old_w"),
        old_h.alias("old_h"),
        F.lit(64).alias("new_w"),
        new_h.alias("new_h"),
        (8 + 64 * F.floor(old_h * 64.0 / old_w)).cast("bigint").alias("new_bytes"),
    ).orderBy("doc_id")


_SHARD_BYTES = 4096  # webdataset-style shard budget for the fixture


@register(
    "multimodal_shard_manifest",
    tags=("llm", "multimodal", "pipeline"),
    oracle=f"""
WITH sized AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(8 + octet_length(encode(text)) AS BIGINT) AS nbytes
  FROM documents
),
placed AS (
  SELECT media_type, doc_id, nbytes,
         SUM(nbytes) OVER (PARTITION BY media_type ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM sized
)
SELECT media_type,
       CAST((cum - nbytes) // {_SHARD_BYTES} AS BIGINT) AS shard_id,
       COUNT(*) AS n_items,
       CAST(SUM(nbytes) AS BIGINT) AS shard_bytes,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM placed
GROUP BY media_type, 2
ORDER BY media_type, shard_id
""",
)
def multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard packing for binary payloads — the webdataset/tar-shard
    build step: assets are packed in deterministic doc_id order into
    ~{_SHARD_BYTES}-byte shards per media type, an item admitted to
    the shard its BYTES-BEFORE total falls in (cum − own < budget
    boundary) — the same greedy-prefix admission rule
    pipeline_domain_quota documents, so a shard overshoots by at
    most one item and the assignment is a pure cumulative-sum
    expression rather than a sequential loop. Returns the manifest a
    shard writer needs: (media_type, shard_id, n_items, shard_bytes,
    first/last doc) — exactly what resumable downloads and
    per-shard shuffling consume.

    Scale shape: ONE hash(media_type) exchange drives the running
    sum; the manifest is #shards rows; payload BYTES never move —
    sizes come from octet_length in place (the oracle recomputes the
    synthetic payload arithmetic, the established multimodal
    pattern). The actual shard write is a partitionBy(shard_id)
    file sink that streams each shard's items in the same doc_id
    order — binary payloads stay on executors end to end."""
    from pyspark.sql import Window

    media = synthesize_media(spark, sf_dir)
    sized = media.select(
        "doc_id", "media_type",
        F.octet_length("payload").cast("bigint").alias("nbytes"),
    )
    w = (
        Window.partitionBy("media_type")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = sized.withColumn("cum", F.sum("nbytes").over(w))
    return (
        placed.withColumn(
            "shard_id",
            F.expr(f"CAST((cum - nbytes) DIV {_SHARD_BYTES} AS BIGINT)"),
        )
        .groupBy("media_type", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("nbytes").cast("bigint").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("media_type", "shard_id")
    )
