"""Micro-batch ingest API — the reference's only streaming surface.

Reference parity (SURVEY.md §2.8): hcatalog/streaming's
TransactionBatch / HiveEndPoint open a transaction batch, write N
records, and commit so rows become visible atomically to subsequent
queries. The Spark-native equivalent is the Parquet file-commit
protocol: a batch append is staged and becomes visible only when the
commit completes — same atomic-visibility contract, no ACID delta
directories (SURVEY.md §7.3 documents this divergence).

``stream_events_available_now`` is the Structured Streaming path:
readStream over the ingest directory → event-time window with
watermark → trigger(availableNow) — the reference has no analogue
(no watermarks / event-time state at all).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F


def append_batch(
    spark: SparkSession,
    rows: Iterable | DataFrame,
    table_path: str,
    schema=None,
) -> None:
    """Append one micro-batch to a Parquet table directory
    (TransactionBatch.commit equivalent).

    Visibility contract, precisely: a reader that starts AFTER this
    call returns sees the whole batch, and a failed job leaves no
    committed files — but a reader listing the directory WHILE a
    multi-file job commit renames task files one at a time can
    observe a prefix of the batch. That matches the reference's
    pre-ACID Parquet behavior, not full TransactionBatch isolation
    (which needed delta directories + the metastore txn list,
    SURVEY §7.3's documented divergence). Single-partition batches
    (one file) commit atomically even against concurrent listers."""
    df = rows if isinstance(rows, DataFrame) else spark.createDataFrame(rows, schema=schema)
    df.write.mode("append").parquet(table_path)


def read_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Read the ingest table (sees only committed batches)."""
    return spark.read.parquet(table_path)


def _windowed_counts(spark: SparkSession, source_dir: str, schema, watermark: str, window: str):
    return (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def stream_events_available_now(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    watermark: str = "10 minutes",
    window: str = "1 hour",
    query_name: str = "events_ingest",
):
    """Catch-up/inspection mode: watermarked event-time tumbling
    counts into a MEMORY sink with ``complete`` output, processing
    everything currently available, then stopping. Returns the
    StreamingQuery; caller awaits termination and reads
    ``spark.table(query_name)``.

    NOTE: in complete mode the watermark does NOT evict window state,
    and the memory sink holds the whole result on the driver — this
    path is for bounded catch-up runs and tests. The runnable-forever,
    bounded-state path is ``stream_events_to_files`` (append mode +
    file sink, where the watermark finalizes and drops windows)."""
    stream = _windowed_counts(spark, source_dir, schema, watermark, window)
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_events_to_files(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    sink_dir: str,
    schema,
    watermark: str = "10 minutes",
    window: str = "1 hour",
):
    """Production path: ``append`` output to a Parquet file sink.
    A window is emitted exactly once, when the watermark passes its
    end; its state is then dropped — so state size is bounded by the
    watermark delay regardless of how long the stream runs, and the
    sink scales with the filesystem rather than driver memory. The
    trade: the trailing window stays open until later data advances
    the watermark past it (exactly-once, at-a-delay semantics)."""
    stream = _windowed_counts(spark, source_dir, schema, watermark, window)
    return (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
