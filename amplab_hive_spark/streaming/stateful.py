"""Custom stateful streaming operator via applyInPandasWithState.

Beyond the reference surface (it has no stateful streaming at all —
SURVEY §2.8): a per-user running aggregate that survives across
micro-batches with timeout-based state expiry — the building block
for fraud counters, rate limiters, CEP-ish accumulators.

Scale: state is partitioned by key across executors (RocksDB/HDFS
state store on a cluster); a GroupStateTimeout eviction bounds the
store. The same callable runs unchanged in a 1000-executor job.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("total_value", DoubleType())]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def make_running_user_totals(idle_timeout_ms: int | None):
    """Build the stateful callable. With a timeout, an idle key's
    state entry is REMOVED when the store's processing-time clock
    passes it — this is what actually bounds the store on an
    unbounded key domain; the totals themselves were already emitted
    with each update, so expiry emits nothing."""

    def running_user_totals(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout_ms is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return running_user_totals


# Default callable (no expiry) for direct imports/tests.
running_user_totals = make_running_user_totals(None)


def stream_running_totals(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    output_dir: str,
    idle_timeout_ms: int | None = 30 * 60 * 1000,
):
    """readStream → groupBy(user) → applyInPandasWithState →
    foreachBatch parquet sink (update rows stamped with the epoch so
    readers take the latest row per key). foreachBatch — not the
    memory sink — because it supports checkpoint recovery, which is
    the point of stateful streaming.

    ``idle_timeout_ms`` (default 30 min) evicts state for keys idle
    longer than that, via ProcessingTimeTimeout — WITHOUT it the
    store grows with every distinct key ever seen, which on an
    unbounded user domain is a slow leak; pass None to keep state
    forever (e.g. short availableNow catch-up runs, where
    processing-time timeouts cannot fire anyway)."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_running_user_totals(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if idle_timeout_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )

    def sink(batch_df, epoch_id: int) -> None:
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(output_dir)

    return (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def latest_totals(spark, output_dir: str):
    """Read the sink: latest (max-epoch) row per user."""
    from pyspark.sql import Window, functions as F

    df = spark.read.parquet(output_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("epoch"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "epoch")
    )
