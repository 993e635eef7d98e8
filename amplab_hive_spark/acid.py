"""Merge-on-read row-level deletes — the delta-file half of the
reference's ACID design, Spark-first.

Reference anchors:
- ql/io/AcidUtils.java (delta_x_y directory layout under the table
  location; readers enumerate base + deltas)
- ql/io/orc/OrcRawRecordMerger.java (read-time merge of base rows
  against delete events)
- ql/parse/UpdateDeleteSemanticAnalyzer.java (DELETE rewritten into
  a sorted ROW__ID insert into a delete delta)
- ql/txn/compactor/Worker.java (major compaction folds deltas back
  into a new base)

Shape here: a DELETE appends a tiny parquet of matched KEY tuples
under ``<table>/_delete_delta/`` — O(matched keys), no base rewrite —
and readers anti-join the base against the union of deltas. This is
the "equality delete" design (also how Iceberg v2 spells row-level
deletes on immutable files), in contrast to ddl.delete_from's
copy-on-write partition rewrite: MOR makes the DELETE cheap and
taxes reads until compaction; COW taxes the delete and keeps reads
free. The reference offers the same trade (streaming ingest writes
deltas; compaction restores scan speed).

Why ``_delete_delta``: Hadoop/Spark file listings treat ``_``- and
``.``-prefixed paths as hidden (the `_SUCCESS` convention), so base
scans — ours or any vanilla ``spark.read.parquet`` — never see the
delta files, exactly like non-ACID readers never see Hive's deltas.

Row identity: the reference synthesizes ROW__ID (writeid, bucket,
rowid) at write time. Plain parquet has no such hook, so deletes are
keyed on caller-named KEY COLUMNS (recorded once in a manifest so
readers need no arguments). Honest divergence, pinned by a test: an
equality delete masks every CURRENT and FUTURE base row with a
matching key until compaction — re-inserting a deleted key without
compacting first leaves it masked (Iceberg orders deletes with
sequence numbers; the reference with write ids; we document and
test the simpler contract instead).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from amplab_hive_spark.ddl import (
    _dynamic_partition_overwrite,
    _partition_columns,
    _reject_nondeterministic,
    _table_location,
)

_DELTA_DIR = "_delete_delta"
_MANIFEST = "_keys.json"


def _local_path(location: str) -> str:
    """Catalog locations are URIs (file:/...); the manifest I/O here
    uses the local filesystem, so reject non-local schemes loudly
    rather than writing a literal ``hdfs:`` directory. (The delta
    PARQUET reads/writes go through Spark and would be
    storage-agnostic; only the tiny JSON manifest is os-level.)"""
    from urllib.parse import urlparse

    parsed = urlparse(location)
    if parsed.scheme in ("", "file"):
        return parsed.path or location
    raise NotImplementedError(
        f"merge-on-read manifest I/O implemented for local warehouses; "
        f"got {location!r} (port _read/_write_manifest to the Hadoop "
        f"FileSystem API for {parsed.scheme})"
    )


def _delta_path(spark: SparkSession, name: str) -> str:
    return os.path.join(_local_path(_table_location(spark, name)), _DELTA_DIR)


def _read_manifest(delta_dir: str) -> list[str] | None:
    path = os.path.join(delta_dir, _MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)["key_cols"]


def _write_manifest(delta_dir: str, key_cols: list[str]) -> None:
    os.makedirs(delta_dir, exist_ok=True)
    path = os.path.join(delta_dir, _MANIFEST)
    existing = _read_manifest(delta_dir)
    if existing is not None:
        if existing != key_cols:
            raise ValueError(
                f"delete-delta keys already pinned to {existing}; a table "
                f"has ONE equality-delete key set (got {key_cols})"
            )
        return
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump({"key_cols": key_cols}, fh)
    os.rename(tmp, path)  # atomic: readers see whole manifest or none


def _delta_frames(spark: SparkSession, name: str) -> tuple[DataFrame | None, list[str] | None]:
    """(union of delete-delta keys, key_cols) or (None, None)."""
    delta_dir = _delta_path(spark, name)
    key_cols = _read_manifest(delta_dir)
    if key_cols is None:
        return None, None
    files = [
        os.path.join(delta_dir, f)
        for f in os.listdir(delta_dir)
        if f.endswith(".parquet")
    ]
    if not files:
        return None, key_cols
    return spark.read.parquet(*files), key_cols


def delete_mor(
    spark: SparkSession, name: str, condition: str, key_cols: list[str],
    compact_after: int | None = None,
) -> int:
    """Merge-on-read DELETE: append the DISTINCT key tuples matching
    ``condition`` (evaluated against the MOR view, so already-deleted
    rows are not re-counted) as one new delta file. The base is never
    rewritten — at 100 TB this is one pruned scan plus a KB-to-MB
    delta write, versus copy-on-write's partition rewrite
    (ddl.delete_from).

    Equality-delete semantics: the delta masks BY KEY — if any row
    of a key group matches, the WHOLE group is deleted (a key group
    is one row whenever key_cols are unique). The return value is
    the number of rows the new delta masks, i.e. the full group
    sizes, not just the condition-matched rows — the honest count
    of what read_mor will stop returning.

    NULL semantics match delete_from: rows where the condition is
    NULL survive. NULL keys are rejected — an equality delete with a
    NULL key matches nothing in the anti-join and would silently
    mask zero rows. Validation happens BEFORE the manifest is
    pinned, so a failed or zero-match statement leaves no trace.

    ``compact_after``: the Initiator analogue
    (ql/txn/compactor/Initiator.java watches delta counts and
    schedules major compaction) — when the table's delta-file count
    reaches this threshold after the delete, compact_mor runs
    inline, folding the deltas and resetting the read tax (measured
    break-even ~10 merged scans, experiments/mor_delete_bench.py)."""
    _reject_nondeterministic(condition, "DELETE")
    _validate_keys(spark, name, key_cols)
    current = read_mor(spark, name)
    cond = F.coalesce(F.expr(condition), F.lit(False))
    # Scan 1 — condition-FIRST, so predicate pushdown and partition
    # pruning apply and only MATCHED rows' keys ever shuffle (a
    # groupBy over all keys would aggregate the whole table to
    # discard almost every group — the 100 TB anti-pattern).
    hit_keys = (
        current.filter(cond).select(*key_cols).distinct()
        .localCheckpoint(eager=True)
    )
    return _commit_key_deletes(
        spark, name, hit_keys, list(key_cols), compact_after
    )


def delete_keys_mor(
    spark: SparkSession, name: str, keys_df: DataFrame,
    key_cols: list[str], compact_after: int | None = None,
) -> int:
    """Merge-on-read DELETE by an explicit KEY FRAME (the CDC
    tombstone shape: a stream or batch of deleted keys rather than a
    predicate — streaming/tombstones.py feeds micro-batches here).
    Same contract as delete_mor: whole key groups mask, the return
    value is the number of PREVIOUSLY-VISIBLE rows the delta masks
    (so re-applying the same keys returns 0 — masking is a set
    union, idempotent by construction), NULL keys are rejected, and
    nothing is pinned or written when no visible row matches."""
    _validate_keys(spark, name, key_cols)
    missing = [c for c in key_cols if c not in keys_df.columns]
    if missing:
        raise ValueError(f"key columns not in tombstone frame: {missing}")
    current = read_mor(spark, name)
    # only keys that currently mask something: keeps the no-op
    # re-delivery path delta-free and the count honest
    hit_keys = (
        keys_df.select(*key_cols).distinct()
        .join(current.select(*key_cols).distinct(), list(key_cols), "left_semi")
        .localCheckpoint(eager=True)
    )
    return _commit_key_deletes(
        spark, name, hit_keys, list(key_cols), compact_after
    )


def _validate_keys(spark: SparkSession, name: str, key_cols: list[str]) -> None:
    base = spark.table(name)
    missing = [c for c in key_cols if c not in base.columns]
    if missing:
        raise ValueError(f"key columns not in {name}: {missing}")
    pinned = _read_manifest(_delta_path(spark, name))
    if pinned is not None and pinned != list(key_cols):
        raise ValueError(
            f"delete-delta keys already pinned to {pinned}; a table "
            f"has ONE equality-delete key set (got {list(key_cols)})"
        )


def _commit_key_deletes(
    spark: SparkSession, name: str, hit_keys: DataFrame,
    key_cols: list[str], compact_after: int | None,
) -> int:
    """Shared tail of both delete forms: NULL-key check, masked-row
    count (Scan 2 — broadcast semi-join of the view against the
    small hit-key set, no shuffle), manifest pin, delta write,
    threshold compaction. ``hit_keys`` must already be distinct and
    eagerly checkpointed."""
    delta_dir = _delta_path(spark, name)
    if hit_keys.isEmpty():
        return 0
    null_keys = hit_keys.filter(
        " OR ".join(f"({c} IS NULL)" for c in key_cols)
    ).count()
    if null_keys:
        raise ValueError(
            f"DELETE matched rows with NULL in key columns {key_cols}; "
            "equality deletes cannot address them — use ddl.delete_from"
        )
    n = read_mor(spark, name).join(
        F.broadcast(hit_keys), on=list(key_cols), how="left_semi"
    ).count()
    # every check passed: NOW pin the manifest and write the delta
    _write_manifest(delta_dir, list(key_cols))
    out = os.path.join(delta_dir, f"delta-{uuid.uuid4().hex}.parquet")
    # one file per DELETE statement, like one delta dir per txn
    hit_keys.coalesce(1).write.parquet(out)
    if compact_after is not None:
        n_deltas = len(
            [f for f in os.listdir(delta_dir) if f.endswith(".parquet")]
        )
        if n_deltas >= compact_after:
            # The delete is already durable (delta written); a
            # compaction failure must not convert a committed DELETE
            # into an exception that loses the caller's count —
            # surface it as a warning, exactly like a failed
            # background compactor run leaves deltas for the next one.
            import warnings

            try:
                compact_mor(spark, name)
            except Exception as ex:  # noqa: BLE001
                warnings.warn(
                    f"auto-compaction after DELETE on {name} failed "
                    f"({ex}); deltas left in place for a later "
                    f"compact_mor", RuntimeWarning, stacklevel=2,
                )
    return int(n)


def read_mor(spark: SparkSession, name: str) -> DataFrame:
    """The merge-on-read view: base rows minus every key present in
    a delete delta (OrcRawRecordMerger's job, as one anti-join).
    Deltas are per-statement key sets — small by construction — so
    the anti-join broadcasts; no shuffle of the base."""
    base = spark.table(name)
    deltas, key_cols = _delta_frames(spark, name)
    if deltas is None:
        return base
    return base.join(F.broadcast(deltas.distinct()), on=key_cols, how="left_anti")


def compact_mor(spark: SparkSession, name: str) -> int:
    """Major compaction (compactor Worker): fold the deltas into the
    base — rewrite the table as its MOR view, then drop the delta
    files. Returns the number of delta files folded. Idempotent:
    re-running with no deltas is a no-op.

    Partitioned tables: dynamic partition overwrite rewrites only
    partitions PRESENT in the folded view, so a partition whose
    every row was delta-deleted must be dropped explicitly — exactly
    ddl.delete_from's emptied-partition handling, and in the same
    order (drops BEFORE the overwrite, after the survivors are
    safely checkpointed) so a mid-statement crash leaves a state
    from which re-running converges. Without the drops, purging the
    deltas would RESURRECT fully-deleted partitions (their base
    files survive the overwrite and the masking delta is gone)."""
    from amplab_hive_spark.ddl import _drop_emptied_partitions, partition_values

    delta_dir = _delta_path(spark, name)
    deltas, _ = _delta_frames(spark, name)
    if deltas is None:
        # no deltas (or an empty manifest): nothing to fold
        if os.path.isdir(delta_dir):
            _purge_delta_dir(delta_dir)
        return 0
    n_files = len([f for f in os.listdir(delta_dir) if f.endswith(".parquet")])
    folded = read_mor(spark, name).localCheckpoint(eager=True)
    pcols = _partition_columns(spark, name)
    if pcols:
        # base partition list from CATALOG METADATA (SHOW PARTITIONS
        # via partition_values) — never a base data scan
        base_parts = {tuple(r) for r in partition_values(spark, name).collect()}
        surviving = {
            tuple(r) for r in folded.select(*pcols).distinct().collect()
        }
        emptied = sorted(base_parts - surviving, key=repr)
        _drop_emptied_partitions(spark, name, pcols, emptied)
        if surviving:
            with _dynamic_partition_overwrite(spark):
                folded.write.insertInto(name, overwrite=True)
    else:
        folded.write.insertInto(name, overwrite=True)
    _purge_delta_dir(delta_dir)
    # Spark caches file listings; direct fs deletes need a refresh
    spark.sql(f"REFRESH TABLE {name}")
    return n_files


def _purge_delta_dir(delta_dir: str) -> None:
    import shutil

    shutil.rmtree(delta_dir, ignore_errors=True)
