"""Custom stateful streaming operator (applyInPandasWithState):
state must persist across micro-batch runs via the checkpoint."""

import datetime as dt
import shutil
import tempfile

import pytest

from amplab_hive_spark.streaming.ingest import append_batch
from amplab_hive_spark.streaming.stateful import latest_totals, stream_running_totals
from tests.test_streaming_ingest import SCHEMA, _mkrows


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stateful_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_state_survives_across_batches(spark, tmpdir):
    t0 = dt.datetime(2024, 6, 1)
    src, ckpt, out = f"{tmpdir}/src", f"{tmpdir}/ckpt", f"{tmpdir}/out"
    # run 1: 70 events (values 0..69), users 0..6 round-robin
    append_batch(spark, _mkrows(0, 70, t0), src, schema=SCHEMA)
    q = stream_running_totals(spark, src, ckpt, SCHEMA, out)
    q.awaitTermination(120)
    first = {r["user_id"]: (r["n_events"], r["total_value"]) for r in latest_totals(spark, out).collect()}
    assert sum(n for n, _ in first.values()) == 70
    assert sum(v for _, v in first.values()) == pytest.approx(sum(range(70)))
    # run 2: 35 more events (values 0..34) → totals must ACCUMULATE from state
    append_batch(spark, _mkrows(100, 35, t0 + dt.timedelta(hours=2)), src, schema=SCHEMA)
    q2 = stream_running_totals(spark, src, ckpt, SCHEMA, out)
    q2.awaitTermination(120)
    second = {r["user_id"]: (r["n_events"], r["total_value"]) for r in latest_totals(spark, out).collect()}
    assert sum(n for n, _ in second.values()) == 105, "state must carry over the checkpoint"
    assert sum(v for _, v in second.values()) == pytest.approx(sum(range(70)) + sum(range(35)))


def test_streaming_transitions_match_batch_lead(spark, sf_dir, tmpdir):
    """The stateful streaming transition counter must reproduce the
    batch lead() matrix exactly when events arrive in event-time
    order: the events table is split into three disjoint time ranges
    (files fed one per micro-batch), so every user's stream is
    ordered across batches — the operator's documented exactness
    regime. Cross-batch transitions (last event of range i -> first
    of range i+1 per user) only appear if state really carries
    last_type over micro-batches."""
    from pyspark.sql import Window, functions as F

    from amplab_hive_spark.catalog import tables
    from amplab_hive_spark.streaming.transitions import stream_transition_counts

    events = tables(spark, sf_dir).events.filter("user_id <= 10")
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    src, ckpt, out = f"{tmpdir}/src", f"{tmpdir}/ckpt", f"{tmpdir}/out"
    for i in range(3):
        start = lo + i * span
        end = hi if i == 2 else lo + (i + 1) * span
        part = events.filter(
            (F.col("ts") >= F.lit(start))
            & (F.col("ts") <= F.lit(end) if i == 2 else F.col("ts") < F.lit(end))
        )
        part.coalesce(1).write.mode("append").parquet(src)
    q = stream_transition_counts(spark, src, ckpt, events.schema, out)
    q.awaitTermination(180)

    streamed = (
        spark.read.parquet(out)
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").alias("n"))
    )
    batch = (
        events.select(
            "event_type",
            F.lead("event_type")
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("next_type"),
        )
        .filter("next_type IS NOT NULL")
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r.from_type, r.to_type): r.n for r in streamed.collect()}
    want = {(r.from_type, r.to_type): r.n for r in batch.collect()}
    assert got == want, "streamed transition matrix must equal the batch lead()"

def test_transition_counts_multi_chunk_ordering():
    """applyInPandasWithState splits one group's micro-batch into
    multiple Arrow chunks (spark.sql.execution.arrow.maxRecordsPerBatch,
    default ~10k) delivered in ARBITRARY order — the function must
    materialize all chunks and sort ONCE before counting, or
    cross-chunk transitions are counted in shuffle order. This unit
    test drives transition_counts directly with shuffled chunks (the
    small-fixture streaming test can't reach the multi-chunk regime).
    """
    import pandas as pd

    from amplab_hive_spark.streaming.transitions import transition_counts

    class FakeState:
        exists = False

        def update(self, t):
            self.get = t
            self.exists = True

    # One user, 6 events in ts order: A B C A B C → transitions
    # AB,BC,CA,AB,BC. Deliver as three chunks OUT of ts order and
    # internally unsorted.
    rows = [
        (1, 10, "A"), (2, 20, "B"), (3, 30, "C"),
        (4, 40, "A"), (5, 50, "B"), (6, 60, "C"),
    ]
    cols = ["event_id", "ts", "event_type"]
    chunks = [
        pd.DataFrame([rows[4], rows[3]], columns=cols),  # middle, reversed
        pd.DataFrame([rows[0], rows[5]], columns=cols),  # ends mixed
        pd.DataFrame([rows[2], rows[1]], columns=cols),  # early, reversed
    ]
    state = FakeState()
    out = pd.concat(list(transition_counts((7,), iter(chunks), state)))
    got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
    assert got == {("A", "B"): 2, ("B", "C"): 2, ("C", "A"): 1}
    assert state.get == ("C",), "state must carry the ts-LAST type, not chunk-last"
