"""Streaming tombstone ingestion — a CDC delete stream applied as
merge-on-read equality deletes: each micro-batch of deleted KEYS
becomes one delta file under the target's ``_delete_delta/`` dir
(acid.delete_keys_mor); readers see the deletes through
acid.read_mor immediately, with zero base rewrites on the hot path.

Reference anchor: the reference's streaming surface is append-only
(hcatalog/streaming TransactionBatch — SURVEY §2.8); its DELETE is
the batch ACID statement whose delta files the compactor folds
(ql/io/AcidUtils.java). This composes the two shapes the way a CDC
pipeline needs: deletes ARRIVE as a stream, land as delta files,
and compaction folds them on the same Initiator-style threshold the
batch path uses.

Why this is idempotent BY CONSTRUCTION (unlike the upsert sink,
whose newest-wins CASE had to be engineered for re-delivery):
masking is a set union. A re-delivered batch's keys are already
masked, so delete_keys_mor's visible-row pre-filter finds nothing,
writes no delta, and returns 0 — at-least-once delivery needs no
epoch tracking at all. Contract tested in
tests/test_streaming_ingest.py:

- stream-applied tombstones == the equivalent batch delete_mor
  (read_mor equality), across any batching of the tombstone files;
- kill/resume (a second availableNow drain over new files) applies
  exactly the remaining tombstones;
- re-delivering an applied batch is a no-op (0 masked, no delta);
- compact_every folds the accumulated deltas into the base.

Scale shape: a tombstone batch is keys only — KBs; each batch costs
one distinct + one broadcast semi-join against the MOR view and one
tiny delta write. State is the delta dir itself, bounded by deleted
keys, not executor memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from amplab_hive_spark.acid import delete_keys_mor


def apply_tombstone_batch(
    spark: SparkSession,
    table_name: str,
    batch_df: DataFrame,
    key_cols: Sequence[str],
    compact_after: int | None = None,
) -> int:
    """One micro-batch of tombstone keys -> one delete delta (or
    nothing, when every key is already masked). Exposed standalone
    so the re-delivery no-op path is directly unit-testable."""
    return delete_keys_mor(
        spark, table_name, batch_df, list(key_cols),
        compact_after=compact_after,
    )


def stream_apply_tombstones(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    table_name: str,
    key_cols: Sequence[str] = ("user_id",),
    max_files_per_trigger: int = 1,
    compact_after: int | None = None,
):
    """readStream over a directory of tombstone files (key columns
    only, ``schema``) → foreachBatch(delete_keys_mor). availableNow:
    drains everything currently available then stops, so catch-up
    runs and checkpoint resumes are plain re-invocations (the
    streaming/ingest.py pattern). foreachBatch sinks run SERIALLY
    within the query, so no two deltas commit concurrently.

    ``compact_after=N``: threshold-fold the deltas once N files
    accumulate — the Initiator trigger riding the ingest path, same
    as stream_upsert_merge's compact_every."""
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_tombstone_batch(
            batch_df.sparkSession, table_name, batch_df, key_cols,
            compact_after=compact_after,
        )

    return (
        reader.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
