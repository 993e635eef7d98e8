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


# --- round 6: streaming upsert (foreachBatch + MERGE INTO) ----------
def _latest_per_key(spark, src_dir):
    from amplab_hive_spark.streaming.upsert import collapse_latest

    return collapse_latest(
        spark.read.parquet(src_dir), ["user_id"], ["ts", "event_id"]
    )


def _key_rows(df):
    return sorted(
        (r.user_id, r.event_id, r.ts, r.event_type, r.value) for r in df.collect()
    )


def _table_rows(spark, name):
    return _key_rows(spark.table(name))


def test_stream_upsert_merge_equals_batch_recompute(spark, tmpdir):
    """The streamed MERGE-maintained table must equal the batch
    newest-per-key recompute over all source rows — including after
    a stop + checkpoint resume, and including STALE late batches
    (older ts for existing keys) that must not regress values."""
    import datetime as dt

    from amplab_hive_spark.ddl import create_table_as
    from amplab_hive_spark.streaming.upsert import stream_upsert_merge

    t0 = dt.datetime(2024, 6, 1)
    src, ckpt = f"{tmpdir}/src", f"{tmpdir}/ckpt"
    name, path = "upsert_target", f"{tmpdir}/warehouse/upsert_target"
    empty = spark.createDataFrame([], SCHEMA)
    create_table_as(spark, name, empty, path)
    try:
        # three batches with overlapping keys (user_id = i % 7)
        append_batch(spark, _mkrows(0, 20, t0), src, schema=SCHEMA)
        append_batch(spark, _mkrows(100, 20, t0 + dt.timedelta(hours=1)), src, schema=SCHEMA)
        append_batch(spark, _mkrows(200, 20, t0 + dt.timedelta(hours=2)), src, schema=SCHEMA)
        q = stream_upsert_merge(spark, src, ckpt, SCHEMA, name)
        q.awaitTermination(180)
        assert _table_rows(spark, name) == _key_rows(_latest_per_key(spark, src))
        assert spark.table(name).count() == 7, "exactly one current row per key"

        # resume from checkpoint: one NEWER batch + one STALE batch
        # (ts BEFORE everything so far — must be ignored, its keys
        # all already exist)
        append_batch(spark, _mkrows(300, 20, t0 + dt.timedelta(hours=3)), src, schema=SCHEMA)
        stale = [(900 + i, t0 - dt.timedelta(hours=5), i % 7, "stale", -1.0) for i in range(7)]
        append_batch(spark, stale, src, schema=SCHEMA)
        q2 = stream_upsert_merge(spark, src, ckpt, SCHEMA, name)
        q2.awaitTermination(180)
        got = _table_rows(spark, name)
        assert got == _key_rows(_latest_per_key(spark, src))
        assert all(r[3] != "stale" for r in got), "stale batch must not regress any key"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_stream_upsert_partitioned_target(spark, tmpdir):
    """A PARTITIONED target must work: partition columns are excluded
    from the WHEN MATCHED set (Hive UPDATE_CANNOT_UPDATE_PART_VALUE —
    merge_into rejects them), so an existing key keeps its original
    partition value while every other column follows newest-wins;
    new keys land in the partition their insert row carries."""
    import datetime as dt

    from amplab_hive_spark.ddl import create_table_as
    from amplab_hive_spark.streaming.upsert import merge_upsert_batch

    t0 = dt.datetime(2024, 6, 1)
    name, path = "upsert_part", f"{tmpdir}/warehouse/upsert_part"
    create_table_as(
        spark,
        name,
        spark.createDataFrame([], SCHEMA),
        path,
        partition_by=("event_type",),
    )
    try:
        b1 = spark.createDataFrame(_mkrows(0, 14, t0, etype="click"), SCHEMA)
        merge_upsert_batch(spark, name, b1, ["user_id"], ["ts", "event_id"])
        # batch 2: same keys, NEWER, different partition value + new keys
        b2_rows = [
            (100 + i, t0 + dt.timedelta(hours=1), i % 7, "view", 100.0 + i)
            for i in range(7)
        ] + [(200, t0 + dt.timedelta(hours=1), 99, "view", 999.0)]
        b2 = spark.createDataFrame(b2_rows, SCHEMA)
        stats = merge_upsert_batch(spark, name, b2, ["user_id"], ["ts", "event_id"])
        assert stats["inserted"] == 1 and stats["updated"] == 7
        got = {r.user_id: r for r in spark.table(name).collect()}
        assert len(got) == 8
        # matched keys: newest non-partition values, ORIGINAL partition
        for uid in range(7):
            assert got[uid].value == 100.0 + uid and got[uid].ts == t0 + dt.timedelta(hours=1)
            assert got[uid].event_type == "click", "partition value must not move"
        # inserted key lands in its own partition
        assert got[99].event_type == "view" and got[99].value == 999.0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_stream_upsert_full_stream_on_partitioned_target(spark, tmpdir):
    """The WHOLE streaming path (readStream → foreachBatch → MERGE)
    against a partitioned table — the unit test covers one batch;
    this drives checkpointed micro-batches end to end and pins that
    keys keep their original partition across batches."""
    import datetime as dt

    from amplab_hive_spark.ddl import create_table_as
    from amplab_hive_spark.streaming.upsert import stream_upsert_merge

    t0 = dt.datetime(2024, 6, 1)
    src, ckpt = f"{tmpdir}/psrc", f"{tmpdir}/pckpt"
    name, path = "upsert_part_stream", f"{tmpdir}/warehouse/upsert_part_stream"
    create_table_as(
        spark, name, spark.createDataFrame([], SCHEMA), path,
        partition_by=("event_type",),
    )
    try:
        # drain the click batch to completion BEFORE writing the view
        # batch: within one availableNow run, FileStreamSource orders
        # files by modification time, and two back-to-back writes can
        # tie on coarse-mtime filesystems — the newest-wins assertion
        # below needs clicks applied first, so force it with two runs
        append_batch(spark, _mkrows(0, 14, t0, etype="click"), src, schema=SCHEMA)
        q0 = stream_upsert_merge(spark, src, ckpt, SCHEMA, name)
        q0.awaitTermination(180)
        append_batch(
            spark,
            [(100 + i, t0 + dt.timedelta(hours=1), i % 7, "view", 100.0 + i)
             for i in range(7)],
            src, schema=SCHEMA,
        )
        q = stream_upsert_merge(spark, src, ckpt, SCHEMA, name)
        q.awaitTermination(180)
        got = {r.user_id: r for r in spark.table(name).collect()}
        assert len(got) == 7
        for uid in range(7):
            assert got[uid].value == 100.0 + uid, "newest values must win"
            assert got[uid].event_type == "click", "partition must not move"
        # resume from checkpoint with a new key in a new partition
        append_batch(
            spark, [(300, t0 + dt.timedelta(hours=2), 99, "stream", 9.0)],
            src, schema=SCHEMA,
        )
        q2 = stream_upsert_merge(spark, src, ckpt, SCHEMA, name)
        q2.awaitTermination(180)
        got = {r.user_id: r for r in spark.table(name).collect()}
        assert got[99].event_type == "stream" and len(got) == 8
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_stream_upsert_redelivery_is_idempotent(spark, tmpdir):
    """foreachBatch is at-least-once: re-applying an already-merged
    micro-batch (the post-crash re-delivery case) must leave the
    table byte-identical — matched keys rewrite equal values via the
    newest-wins CASE, and nothing inserts twice."""
    import datetime as dt

    from amplab_hive_spark.ddl import create_table_as
    from amplab_hive_spark.streaming.upsert import merge_upsert_batch

    t0 = dt.datetime(2024, 6, 1)
    name, path = "upsert_redeliver", f"{tmpdir}/warehouse/upsert_redeliver"
    create_table_as(spark, name, spark.createDataFrame([], SCHEMA), path)
    try:
        b1 = spark.createDataFrame(_mkrows(0, 20, t0), SCHEMA)
        b2 = spark.createDataFrame(_mkrows(100, 10, t0 + dt.timedelta(hours=1)), SCHEMA)
        merge_upsert_batch(spark, name, b1, ["user_id"], ["ts", "event_id"])
        merge_upsert_batch(spark, name, b2, ["user_id"], ["ts", "event_id"])
        before = _table_rows(spark, name)
        stats = merge_upsert_batch(spark, name, b2, ["user_id"], ["ts", "event_id"])
        assert stats["inserted"] == 0, "re-delivered keys must all match"
        assert _table_rows(spark, name) == before
        # and a second full replay of the OLDER batch is also a no-op
        merge_upsert_batch(spark, name, b1, ["user_id"], ["ts", "event_id"])
        assert _table_rows(spark, name) == before
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_stream_upsert_with_auto_compaction(spark, tmpdir):
    """compact_every=N folds the compactor Initiator into the ingest
    path: insert-dominant micro-batches fragment each partition into
    per-batch files; with compact_every=2 over 4 batches the final
    table holds ONE file per partition while the data is identical
    to an uncompacted control stream over the same source."""
    import datetime as dt

    from amplab_hive_spark import ddl
    from amplab_hive_spark.ddl import create_table_as
    from amplab_hive_spark.streaming.upsert import stream_upsert_merge

    t0 = dt.datetime(2024, 6, 1)
    src = f"{tmpdir}/csrc"
    # 4 insert-dominant batches: all-new keys, two partitions each
    for b in range(1, 5):
        rows = [
            (1000 * b + i, t0 + dt.timedelta(hours=b), 1000 * b + i,
             "click" if i % 2 else "view", float(b))
            for i in range(20)
        ]
        append_batch(spark, rows, src, schema=SCHEMA)

    names = {}
    for label, extra in (
        ("plain", {}),
        ("compacted", {"compact_every": 2, "compact_target_mb": 128}),
    ):
        name = f"upsert_autocompact_{label}"
        create_table_as(
            spark, name, spark.createDataFrame([], SCHEMA),
            f"{tmpdir}/warehouse/{name}", partition_by=("event_type",),
        )
        q = stream_upsert_merge(
            spark, src, f"{tmpdir}/ckpt_{label}", SCHEMA, name, **extra
        )
        q.awaitTermination(180)
        names[label] = name
    try:
        rows_plain = _table_rows(spark, names["plain"])
        rows_comp = _table_rows(spark, names["compacted"])
        assert rows_plain == rows_comp, "compaction must not change data"
        assert len(rows_comp) == 80

        def file_counts(name):
            loc = ddl._table_location(spark, name)
            return {k: len(v) for k, v in ddl._list_data_files(spark, loc).items()}

        fc_plain = file_counts(names["plain"])
        fc_comp = file_counts(names["compacted"])
        assert all(n > 1 for n in fc_plain.values()), (
            f"control must be fragmented: {fc_plain}"
        )
        assert all(n == 1 for n in fc_comp.values()), (
            f"every partition must end compacted to one file: {fc_comp}"
        )
    finally:
        for name in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {name}")


# --- round 7: streaming tombstones (CDC deletes -> MOR deltas) ------


def test_stream_tombstones_equal_batch_delete_and_idempotent(spark, tmpdir):
    """Tombstone keys streamed through stream_apply_tombstones must
    leave read_mor equal to the one-shot batch delete of the same
    keys; re-draining the SAME files after the checkpoint already
    consumed them applies nothing; and re-applying an already-applied
    batch through the standalone entry returns 0 and writes no delta
    (idempotent by construction — masking is a set union)."""
    import os as _os

    from pyspark.sql.types import LongType, StructField, StructType

    from amplab_hive_spark import acid
    from amplab_hive_spark.ddl import create_table_as
    from amplab_hive_spark.streaming.tombstones import (
        apply_tombstone_batch,
        stream_apply_tombstones,
    )

    key_schema = StructType([StructField("k", LongType())])
    src, ckpt = f"{tmpdir}/tomb_src", f"{tmpdir}/tomb_ckpt"
    _os.makedirs(src)
    name, path = "tomb_target", f"{tmpdir}/warehouse/tomb_target"
    base = spark.range(100).selectExpr("id AS k", "concat('v-', id) AS label")
    create_table_as(spark, name, base, path)
    try:
        # two tombstone files -> two micro-batches (maxFilesPerTrigger=1)
        spark.createDataFrame([(i,) for i in range(0, 10)], key_schema) \
            .coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame([(i,) for i in range(5, 15)], key_schema) \
            .coalesce(1).write.mode("append").parquet(src)
        q = stream_apply_tombstones(spark, src, ckpt, key_schema, name,
                                    key_cols=("k",))
        q.awaitTermination(180)
        visible = sorted(r["k"] for r in acid.read_mor(spark, name).collect())
        assert visible == list(range(15, 100))
        # overlapping second batch masked only the 5 NEW keys; both
        # deltas exist (overlap pruned to new keys, still a delta)
        delta_dir = acid._delta_path(spark, name)
        n_deltas = len([f for f in _os.listdir(delta_dir)
                        if f.endswith(".parquet")])
        assert n_deltas == 2

        # checkpoint resume with nothing new: applies nothing
        q2 = stream_apply_tombstones(spark, src, ckpt, key_schema, name,
                                     key_cols=("k",))
        q2.awaitTermination(180)
        assert sorted(r["k"] for r in acid.read_mor(spark, name).collect()) \
            == list(range(15, 100))

        # at-least-once re-delivery of an applied batch: 0, no delta
        redelivered = spark.createDataFrame([(i,) for i in range(0, 15)],
                                            key_schema)
        assert apply_tombstone_batch(spark, name, redelivered, ("k",)) == 0
        assert len([f for f in _os.listdir(delta_dir)
                    if f.endswith(".parquet")]) == n_deltas

        # equals the batch one-shot delete of the same key set
        name2, path2 = "tomb_batch", f"{tmpdir}/warehouse/tomb_batch"
        create_table_as(spark, name2, base, path2)
        acid.delete_mor(spark, name2, "k < 15", ["k"])
        assert (sorted(map(tuple, acid.read_mor(spark, name).collect()))
                == sorted(map(tuple, acid.read_mor(spark, name2).collect())))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql("DROP TABLE IF EXISTS tomb_batch")


def test_stream_tombstones_threshold_compaction(spark, tmpdir):
    """compact_after folds the accumulated tombstone deltas into the
    base mid-stream: after the threshold batch, the delta dir resets
    and the BASE no longer contains the masked rows."""
    import os as _os

    from pyspark.sql.types import LongType, StructField, StructType

    from amplab_hive_spark import acid
    from amplab_hive_spark.ddl import create_table_as
    from amplab_hive_spark.streaming.tombstones import stream_apply_tombstones

    key_schema = StructType([StructField("k", LongType())])
    src, ckpt = f"{tmpdir}/tombc_src", f"{tmpdir}/tombc_ckpt"
    _os.makedirs(src)
    name, path = "tombc_target", f"{tmpdir}/warehouse/tombc_target"
    create_table_as(
        spark, name,
        spark.range(60).selectExpr("id AS k", "id * 2 AS dbl"), path)
    try:
        for lo in (0, 10, 20):  # three single-file batches
            spark.createDataFrame([(i,) for i in range(lo, lo + 10)],
                                  key_schema) \
                .coalesce(1).write.mode("append").parquet(src)
        q = stream_apply_tombstones(spark, src, ckpt, key_schema, name,
                                    key_cols=("k",), compact_after=3)
        q.awaitTermination(180)
        # threshold folded the deltas; the pin survives (r9 contract)
        assert acid._scan_deltas(acid._delta_path(spark, name)) == [], \
            "threshold must have folded the deltas"
        assert acid.mor_keys(spark, name) == ["k"]
        assert sorted(r["k"] for r in spark.table(name).collect()) \
            == list(range(30, 60))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
