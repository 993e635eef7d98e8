"""Ingest + Structured Streaming tests (reference surface:
hcatalog/streaming TransactionBatch — SURVEY.md §2.8)."""

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from amplab_hive_spark.streaming.ingest import (
    append_batch,
    read_table,
    stream_events_available_now,
    stream_events_to_files,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _mkrows(start_id, n, t0, step_s=60, etype="click"):
    return [
        (start_id + i, t0 + dt.timedelta(seconds=i * step_s), i % 7, etype, float(i))
        for i in range(n)
    ]


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ingest_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_append_batch_atomic_visibility(spark, tmpdir):
    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    path = f"{tmpdir}/events_tbl"
    append_batch(spark, _mkrows(0, 50, t0), path, schema=SCHEMA)
    assert read_table(spark, path).count() == 50
    append_batch(spark, _mkrows(50, 30, t0, etype="view"), path, schema=SCHEMA)
    df = read_table(spark, path)
    assert df.count() == 80
    # each batch is fully present (no partial visibility)
    by_type = {r["event_type"]: r["n"] for r in df.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert by_type == {"click": 50, "view": 30}


def test_streaming_available_now_with_watermark(spark, tmpdir):
    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    src = f"{tmpdir}/stream_src"
    ckpt = f"{tmpdir}/ckpt"
    append_batch(spark, _mkrows(0, 120, t0), src, schema=SCHEMA)  # 2 hours of clicks
    append_batch(spark, _mkrows(200, 60, t0, etype="view"), src, schema=SCHEMA)
    q = stream_events_available_now(spark, src, ckpt, SCHEMA, query_name="ingest_t1")
    q.awaitTermination(120)
    out = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table("ingest_t1").collect()
    }
    # batch-equivalent oracle over the same files
    expected = {
        (r["ws"], r["event_type"]): r["n"]
        for r in read_table(spark, src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    assert out == expected
    # resuming from the checkpoint after a new batch picks up ONLY the delta
    append_batch(spark, _mkrows(400, 30, t0 + dt.timedelta(hours=3)), src, schema=SCHEMA)
    q2 = stream_events_available_now(spark, src, ckpt, SCHEMA, query_name="ingest_t2")
    q2.awaitTermination(120)
    total = sum(r["n_events"] for r in spark.table("ingest_t2").collect())
    assert total == 120 + 60 + 30


def test_streaming_append_file_sink_bounded_state(spark, tmpdir):
    """The production path: append mode + parquet sink. A window is
    emitted exactly once when the watermark passes its end, then its
    state is dropped — bounded state regardless of stream lifetime."""
    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    src = f"{tmpdir}/astream_src"
    ckpt = f"{tmpdir}/astream_ckpt"
    sink = f"{tmpdir}/astream_sink"
    # 2 hours of events: windows [t0,t0+1h) and [t0+1h,t0+2h).
    append_batch(spark, _mkrows(0, 120, t0), src, schema=SCHEMA)
    q = stream_events_to_files(spark, src, ckpt, sink, SCHEMA)
    q.awaitTermination(120)
    out1 = spark.read.parquet(sink)
    starts1 = {r["window_start"] for r in out1.collect()}
    # watermark = max(ts) - 10min = t0+1h49m: only window 1 finalized.
    assert starts1 == {t0}
    assert out1.filter(F.col("window_start") == t0).collect()[0]["n_events"] == 60
    # Later data advances the watermark past window 2 -> it is emitted
    # exactly once on the next run, from checkpointed (not re-read) state.
    append_batch(spark, _mkrows(400, 5, t0 + dt.timedelta(hours=3)), src, schema=SCHEMA)
    q2 = stream_events_to_files(spark, src, ckpt, sink, SCHEMA)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(sink)
    counts = {
        r["window_start"]: r["n_events"]
        for r in out2.groupBy("window_start").agg(F.sum("n_events").alias("n_events")).collect()
    }
    assert counts[t0] == 60  # no duplicate emission of window 1
    assert counts[t0 + dt.timedelta(hours=1)] == 60
