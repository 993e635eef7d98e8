"""Streaming deduplication — the streaming leg of the dedup family
(llm/dedup.py is the batch leg).

Beyond the reference surface (it has no streaming operators at all,
SURVEY §2.8): exactly-once ingest pipelines need duplicate
suppression at the door — retried producer batches, at-least-once
sources, double-fired webhooks. Two Spark-native levels:

1. ``dedup_stream_exact``: ``dropDuplicatesWithinWatermark`` on the
   event id — state is bounded by the watermark delay (Spark evicts
   keys older than the watermark), so the state store does NOT grow
   with the stream. This is the 100 TB-safe form: an unbounded
   ``dropDuplicates`` would accumulate every key ever seen.
2. ``dedup_stream_content``: same operator keyed on a content hash
   (sha2 of the payload columns) — suppresses *semantic* retries
   where the producer re-sent the same payload under a new id.

State scale argument: keys live ``delay`` long; store size ≈
ingest-rate × delay × key-width, independent of total stream
length. Partitioned by key hash across executors; RocksDB-backed on
a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def dedup_stream_exact(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Suppress re-deliveries of the same ``event_id`` arriving
    within ``delay`` of each other (watermark-bounded state)."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(["event_id"])


def dedup_stream_content(
    events: DataFrame,
    delay: str = "10 minutes",
    payload_cols: tuple[str, ...] = ("user_id", "event_type", "value"),
) -> DataFrame:
    """Suppress payload-identical retries regardless of id: key the
    watermarked dedup state on a content fingerprint.

    Each column is null-coalesced to a sentinel BEFORE concatenation:
    ``concat_ws`` silently SKIPS null arguments, so without the
    sentinel (event_type=NULL, value='5.0') and (event_type='5.0',
    value=NULL) would fingerprint identically and one genuinely
    distinct event would be dropped as a duplicate. U+001E marks a
    null cell, U+001F separates cells — neither occurs in cast
    numeric/categorical payloads."""
    fingerprinted = events.withColumn(
        "content_key",
        F.sha2(
            F.concat_ws(
                "\x1f",
                *[F.coalesce(F.col(c).cast("string"), F.lit("\x1e")) for c in payload_cols],
            ),
            256,
        ),
    )
    return (
        fingerprinted.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["content_key"])
        .drop("content_key")
    )


def run_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    out_dir: str,
    keyed_on: str = "exact",
    delay: str = "10 minutes",
):
    """availableNow micro-batch run: read the ingest table as a
    stream, dedup, append survivors to ``out_dir``. Re-running with
    the same checkpoint resumes the state store, so duplicates that
    arrive in a LATER batch (within the watermark) are still
    suppressed."""
    if keyed_on not in ("exact", "content"):
        raise ValueError(
            f"keyed_on must be 'exact' or 'content', got {keyed_on!r} — a typo "
            "here must not silently switch dedup semantics"
        )
    stream = spark.readStream.schema(schema).parquet(source_dir)
    deduped = (
        dedup_stream_exact(stream, delay)
        if keyed_on == "exact"
        else dedup_stream_content(stream, delay)
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
