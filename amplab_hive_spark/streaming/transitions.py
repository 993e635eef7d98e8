"""Streaming event-type transition counting — the stateful
low-latency twin of the batch ``events_path_transitions`` operator
(streaming/event_windows.py): per-user state carries the LAST seen
event type across micro-batches, each batch emits the new
(from_type -> to_type) pair counts, and a downstream rollup keeps
the global Markov matrix current without re-scanning history.

Reference anchor: the reference's PTF windowing (lead/lag,
ql/exec/PTFOperator.java:46) has no streaming counterpart at all —
this is the SURVEY §2.8 beyond-reference surface, same family as
streaming/stateful.py.

Ordering contract (the honest caveat): transitions are counted in
(ts, event_id) order WITHIN each micro-batch, and batches are
consumed in arrival order — so the result equals the batch lead()
computation exactly when the source delivers each user's events in
event-time order across batches (true for time-partitioned file
drops and per-key-ordered queues like Kafka partitions keyed by
user). Out-of-order arrival across batches counts the
processing-order transition instead; an exactness-critical pipeline
runs the batch operator over the settled log.

Scale: state is ONE small tuple per user key, partitioned across
executors' state stores; emission is bounded by distinct transition
pairs per user per batch. No timeout by default — pair with a
ProcessingTimeTimeout as in stateful.py when the key domain is
unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

TRANSITION_STATE_SCHEMA = StructType([StructField("last_type", StringType())])

TRANSITION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
        StructField("n", LongType()),
    ]
)


def transition_counts(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Count (prev -> next) event-type pairs for one user across one
    micro-batch, carrying the last seen type in state."""
    from collections import Counter

    last_type = state.get[0] if state.exists else None
    counts: Counter = Counter()
    # applyInPandasWithState splits one group's micro-batch into
    # multiple Arrow chunks (~10k rows) in arbitrary order, so the
    # (ts, event_id) ordering contract requires materializing the
    # whole group and sorting ONCE — a per-chunk sort would count
    # cross-chunk transitions in shuffle order. State stays one
    # tuple; the per-user per-batch row count bounds the concat.
    chunks = list(batches)
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        for et in pdf["event_type"]:
            if last_type is not None:
                counts[(last_type, et)] += 1
            last_type = et
    if last_type is not None:
        state.update((last_type,))
    if counts:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(counts),
                "from_type": [k[0] for k in counts],
                "to_type": [k[1] for k in counts],
                "n": list(counts.values()),
            }
        )


def stream_transition_counts(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    output_dir: str,
    max_files_per_trigger: int = 1,
):
    """readStream → groupBy(user) → applyInPandasWithState →
    foreachBatch parquet sink of per-batch pair counts; readers sum
    over epochs for the cumulative matrix. availableNow so catch-up
    runs drain the source and stop (streaming/ingest.py pattern)."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            transition_counts,
            outputStructType=TRANSITION_OUTPUT_SCHEMA,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

    def sink(batch_df, epoch_id: int) -> None:
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            output_dir
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
