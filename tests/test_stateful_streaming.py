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
