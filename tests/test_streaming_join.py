"""Stream-stream interval join (streaming/join.py): the streamed
click→purchase attribution must equal the equivalent BATCH interval
join over the same files — and state must be watermark-bounded by
construction (both sides watermarked + two-sided time condition)."""

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from amplab_hive_spark.streaming.ingest import append_batch
from amplab_hive_spark.streaming.join import run_attribution_stream
from tests.test_streaming_ingest import SCHEMA


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sjoin_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_join_matches_batch_interval_join(spark, tmpdir):
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    pdir, cdir = f"{tmpdir}/purchases", f"{tmpdir}/clicks"
    ckpt, out = f"{tmpdir}/ckpt", f"{tmpdir}/out"

    clicks = [
        # (event_id, ts_offset_min, user)
        (101, -9, 1),   # inside the 10-min lookback of purchase@0
        (102, -10, 1),  # exactly lookback before → EXCLUDED (open lower bound)
        (103, 0, 1),    # same instant → INCLUDED (closed upper bound)
        (104, 5, 1),    # after the purchase → excluded
        (105, -3, 2),   # other user's click
        (106, -70, 1),  # far in the past → excluded
    ]
    purchases = [(201, 0, 1), (202, 4, 2)]
    append_batch(
        spark,
        [(i, t0 + dt.timedelta(minutes=m), u, "click", 1.0) for i, m, u in clicks],
        cdir,
        schema=SCHEMA,
    )
    append_batch(
        spark,
        [(i, t0 + dt.timedelta(minutes=m), u, "purchase", 1.0) for i, m, u in purchases],
        pdir,
        schema=SCHEMA,
    )

    q = run_attribution_stream(spark, pdir, cdir, ckpt, SCHEMA, out)
    q.awaitTermination(120)
    streamed = {
        (r.purchase_id, r.click_id)
        for r in spark.read.parquet(out).collect()
    }

    # Batch oracle: same interval join over the same files.
    p = (
        spark.read.parquet(pdir)
        .filter("event_type = 'purchase'")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts"))
    )
    c = (
        spark.read.parquet(cdir)
        .filter("event_type = 'click'")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts"))
    )
    batch = {
        (r.purchase_id, r.click_id)
        for r in p.join(
            c,
            F.expr(
                "user_id = c_user_id AND click_ts <= purchase_ts "
                "AND click_ts > purchase_ts - INTERVAL 10 MINUTES"
            ),
        ).collect()
    }
    assert streamed == batch
    # and pin the boundary semantics explicitly
    assert (201, 103) in streamed, "closed upper bound (same instant) must match"
    assert (201, 102) not in streamed, "open lower bound must exclude exact-lookback click"
    assert (201, 101) in streamed
    assert (202, 105) in streamed
    assert all(pid != 201 or cid not in (104, 106) for pid, cid in streamed)


def test_stream_join_incremental_batches_via_checkpoint(spark, tmpdir):
    """A purchase arriving in a LATER micro-batch run still joins
    clicks delivered earlier (click state persists via the
    checkpoint across runs)."""
    t0 = dt.datetime(2024, 6, 2, 9, 0, 0)
    pdir, cdir = f"{tmpdir}/purchases", f"{tmpdir}/clicks"
    ckpt, out = f"{tmpdir}/ckpt", f"{tmpdir}/out"

    append_batch(
        spark,
        [(301, t0, 7, "click", 1.0)],
        cdir,
        schema=SCHEMA,
    )
    # purchases dir needs at least a schema-compatible file for run 1
    append_batch(spark, [(398, t0 - dt.timedelta(hours=2), 9, "purchase", 1.0)], pdir, schema=SCHEMA)
    run_attribution_stream(spark, pdir, cdir, ckpt, SCHEMA, out).awaitTermination(120)

    append_batch(
        spark,
        [(399, t0 + dt.timedelta(minutes=5), 7, "purchase", 1.0)],
        pdir,
        schema=SCHEMA,
    )
    run_attribution_stream(spark, pdir, cdir, ckpt, SCHEMA, out).awaitTermination(120)
    got = {(r.purchase_id, r.click_id) for r in spark.read.parquet(out).collect()}
    assert (399, 301) in got
