"""Streaming dedup (streaming/dedup.py): duplicate suppression with
watermark-bounded state, including duplicates split across separate
micro-batch runs (state survives via the checkpoint)."""

import datetime as dt
import shutil
import tempfile

import pytest

from amplab_hive_spark.streaming.dedup import run_dedup_stream
from amplab_hive_spark.streaming.ingest import append_batch
from tests.test_streaming_ingest import SCHEMA


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sdedup_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(ids, t0, user=1, etype="click", value=1.0):
    return [
        (i, t0 + dt.timedelta(seconds=n), user, etype, value)
        for n, i in enumerate(ids)
    ]


def test_exact_dedup_within_batch(spark, tmpdir):
    t0 = dt.datetime(2024, 6, 1)
    src, ckpt, out = f"{tmpdir}/src", f"{tmpdir}/ckpt", f"{tmpdir}/out"
    append_batch(spark, _rows([1, 2, 2, 3, 3, 3], t0), src, schema=SCHEMA)
    q = run_dedup_stream(spark, src, ckpt, SCHEMA, out)
    q.awaitTermination(120)
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]


def test_exact_dedup_across_batches_via_checkpoint(spark, tmpdir):
    t0 = dt.datetime(2024, 6, 1)
    src, ckpt, out = f"{tmpdir}/src", f"{tmpdir}/ckpt", f"{tmpdir}/out"
    append_batch(spark, _rows([10, 11], t0), src, schema=SCHEMA)
    run_dedup_stream(spark, src, ckpt, SCHEMA, out).awaitTermination(120)
    # second delivery retries id 11 within the watermark window and
    # adds id 12 — the retry must be dropped by checkpointed state
    append_batch(spark, _rows([11, 12], t0 + dt.timedelta(seconds=30)), src, schema=SCHEMA)
    run_dedup_stream(spark, src, ckpt, SCHEMA, out).awaitTermination(120)
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [10, 11, 12], "duplicate across micro-batches must be suppressed"


def test_content_dedup_catches_new_id_same_payload(spark, tmpdir):
    t0 = dt.datetime(2024, 6, 1)
    src, ckpt, out = f"{tmpdir}/src", f"{tmpdir}/ckpt", f"{tmpdir}/out"
    rows = _rows([1], t0) + _rows([2], t0)  # different ids, same payload
    rows += _rows([3], t0, value=9.9)  # genuinely different payload
    append_batch(spark, rows, src, schema=SCHEMA)
    q = run_dedup_stream(spark, src, ckpt, SCHEMA, out, keyed_on="content")
    q.awaitTermination(120)
    surviving = spark.read.parquet(out).collect()
    assert len(surviving) == 2, "id-rotated duplicate payload must be suppressed"
    assert {r.value for r in surviving} == {1.0, 9.9}
    assert "content_key" not in spark.read.parquet(out).columns


def test_content_dedup_null_position_is_not_a_collision(spark, tmpdir):
    """Regression: concat_ws silently SKIPS null columns, so before
    the null-sentinel fix (event_type=NULL, value=5.0) and
    (event_type='5.0', value=NULL) fingerprinted identically and one
    genuinely distinct event was dropped. Both must survive."""
    t0 = dt.datetime(2024, 6, 1)
    src, ckpt, out = f"{tmpdir}/src", f"{tmpdir}/ckpt", f"{tmpdir}/out"
    rows = [
        (1, t0, 7, None, 5.0),
        (2, t0 + dt.timedelta(seconds=1), 7, "5.0", None),
    ]
    append_batch(spark, rows, src, schema=SCHEMA)
    q = run_dedup_stream(spark, src, ckpt, SCHEMA, out, keyed_on="content")
    q.awaitTermination(120)
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2]


def test_run_dedup_stream_rejects_unknown_mode(spark, tmpdir):
    with pytest.raises(ValueError, match="keyed_on"):
        run_dedup_stream(
            spark, f"{tmpdir}/src", f"{tmpdir}/ckpt", SCHEMA, f"{tmpdir}/out",
            keyed_on="exactt",
        )
