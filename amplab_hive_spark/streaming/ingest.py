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

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


def append_batch(
    spark: SparkSession,
    rows: Iterable | DataFrame,
    table_path: str,
    schema=None,
) -> None:
    """Append one micro-batch to a Parquet table directory with
    atomic visibility (TransactionBatch.commit equivalent)."""
    df = rows if isinstance(rows, DataFrame) else spark.createDataFrame(rows, schema=schema)
    df.write.mode("append").parquet(table_path)


def read_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Read the ingest table (sees only committed batches)."""
    return spark.read.parquet(table_path)


def stream_events_available_now(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    watermark: str = "10 minutes",
    window: str = "1 hour",
    query_name: str = "events_ingest",
):
    """Structured Streaming over the ingest directory: watermarked
    event-time tumbling-window counts into a memory sink, processing
    everything currently available, then stopping (micro-batch
    catch-up mode). Returns the StreamingQuery; caller awaits
    termination and reads ``spark.table(query_name)``.

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and dropped — this is what makes the
    pipeline runnable forever at scale."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
