"""Streaming upsert — foreachBatch + MERGE INTO composition: a
stream whose micro-batches MERGE into a warehouse table (dedup on
key, newest-version-wins update-else-insert). This is the last
pipeline shape a production ingest needs beyond append
(streaming/ingest.py): the table converges to exactly one CURRENT
row per key no matter how the source is batched, ordered, or —
after a checkpoint restart — partially re-delivered.

Reference anchor: the reference's streaming surface stops at
TransactionBatch appends (hcatalog/streaming — SURVEY §2.8); MERGE
landed in Hive 2.2 as a batch-only statement. The composition of
the two is beyond-reference, built from this repo's own verbs
(ddl.merge_into + Structured Streaming foreachBatch).

Correctness contract (tested in tests/test_streaming_ingest.py):

- **Equals the batch recompute.** After any sequence of micro-
  batches, the table equals "keep each key's row with the maximum
  (order_cols) over ALL source rows". The per-batch collapse keeps
  only each key's newest row (MERGE's ANSI cardinality rule demands
  one source row per target row), and the WHEN MATCHED update is
  newest-wins (a CASE on struct(order_cols) comparison), so stale
  rows arriving in later batches never regress a key — the fold is
  order-independent across batches.
- **Idempotent per batch.** foreachBatch is at-least-once: after a
  crash, the last batch may be re-delivered under the same epoch.
  Re-merging an already-applied batch matches every key and the
  newest-wins CASE compares equal → rewrites identical values;
  nothing inserts twice (the keys now exist). The residual is
  merge_into's own documented crash window (a failure BETWEEN its
  overwrite and append steps) — reconcile by key before resuming,
  exactly as ddl.merge_into's docstring prescribes.

Scale shape: each micro-batch collapse is one window over the batch
(small side); merge_into's discovery semi-join prunes the rewrite
to touched partitions and AQE broadcasts the batch. State is the
TABLE itself — no streaming state store, so key cardinality is
bounded by the warehouse, not executor memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from amplab_hive_spark.ddl import _partition_columns, merge_into


def collapse_latest(
    df: DataFrame, key_cols: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """Keep each key's single newest row by (order_cols) descending —
    the pre-MERGE dedup that satisfies the ANSI one-source-row-per-
    target-row cardinality rule."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert_batch(
    spark: SparkSession,
    table_name: str,
    batch_df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> dict[str, int]:
    """Apply one micro-batch as a newest-wins MERGE. Exposed
    standalone so the at-least-once re-delivery path is directly
    unit-testable (re-applying the same batch must be a no-op)."""
    cols = batch_df.columns
    batch = collapse_latest(batch_df, key_cols, order_cols)
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    s_ver = "struct(" + ", ".join(f"s.{c}" for c in order_cols) + ")"
    t_ver = "struct(" + ", ".join(f"t.{c}" for c in order_cols) + ")"
    # Partition columns behave like keys for MATCHED rows: Hive's
    # UPDATE_CANNOT_UPDATE_PART_VALUE rule (merge_into rejects them in
    # the update set) means an existing key never moves partitions —
    # updates keep the row's original partition value; only the INSERT
    # path sets partition columns, from the batch row.
    pcols = {p.lower() for p in _partition_columns(spark, table_name)}
    # >= not >: an equal version is a re-delivered row with identical
    # values — taking s keeps the update expression total and the
    # merge idempotent.
    update = {
        c: f"CASE WHEN {s_ver} >= {t_ver} THEN s.{c} ELSE t.{c} END"
        for c in cols
        if c not in key_cols and c.lower() not in pcols
    }
    insert = {c: f"s.{c}" for c in cols}
    return merge_into(
        spark,
        table_name,
        batch,
        on=on,
        matched_update=update,
        not_matched_insert=insert,
    )


def stream_upsert_merge(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    table_name: str,
    key_cols: Sequence[str] = ("user_id",),
    order_cols: Sequence[str] = ("ts", "event_id"),
    max_files_per_trigger: int = 1,
    compact_every: int | None = None,
    compact_target_mb: int = 128,
):
    """readStream over the ingest directory → foreachBatch(newest-
    wins MERGE INTO table_name). availableNow: drains everything
    currently available then stops, so catch-up runs and checkpoint
    resumes are plain re-invocations (streaming/ingest.py pattern).
    The target table must exist (create it with ddl.create_table_as
    over an empty frame of the stream schema).

    ``compact_every=N``: after every Nth non-empty batch, run
    ddl.compact_table over the target — the reference's compactor
    Initiator daemon (ql/txn/compactor/Initiator.java) folded into
    the ingest path itself, closing the loop this round opened:
    insert-dominant micro-batches fragment partitions into per-batch
    files, and without periodic compaction every later scan pays for
    it (experiments/compaction_bench.py measures 7× at 2000
    fragments). Safe mid-stream because foreachBatch sinks run
    SERIALLY within a query: no merge executes while the compaction
    rewrites, and compaction is row-preserving by construction. The
    batch counter is in-process (resets on restart) — compaction
    cadence is an optimization, not state, so losing it costs at
    most one early/late compaction, never correctness."""
    n_batches = [0]

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_upsert_batch(spark, table_name, batch_df, key_cols, order_cols)
        if compact_every:
            n_batches[0] += 1
            if n_batches[0] % compact_every == 0:
                from amplab_hive_spark.ddl import compact_table

                compact_table(spark, table_name, target_mb=compact_target_mb)

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
