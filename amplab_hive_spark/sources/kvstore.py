"""Storage-handler extension point — a key-value store connector on
Spark's Python Data Source API (round 11).

The reference's pluggable external-storage capability is the
StorageHandler SPI: HBaseStorageHandler
(hbase-handler/src/java/org/apache/hadoop/hive/hbase/
HBaseStorageHandler.java:80) binds a Hive table to an HBase table via
``hbase.columns.mapping`` (``:key,cf:col,...`` — HBaseSerDe), exposes
one split per REGION, and pushes row-key predicates down as scan
ranges (HiveHBaseTableInputFormat's key-range conversion); Accumulo's
handler is the same shape. The HBase/Accumulo CLIENTS are
environment-bound (no servers here — that part stays a documented
non-goal), but the CAPABILITY they plug into is what this module
re-expresses Spark-first: ``pyspark.sql.datasource.DataSource`` is
Spark's storage-handler SPI, and this connector implements the same
three contracts against a deterministic on-disk key-value store
(sorted JSON "region" files — the simulation boundary, exactly like
llm/multimodal.py's decoder stub):

- **columns mapping** (``columns.mapping`` option, HBaseSerDe's
  ``:key,f:a,f:b`` syntax paired positionally with ``columns``): the
  row key and family:qualifier cells become DataFrame columns;
- **region parallelism**: one InputPartition per region file, so the
  scan scales with region count, never through the driver;
- **key-predicate pushdown** (``pushFilters``, Spark 4.1): =, <, <=,
  >, >= on the row-key column become a [start, stop] scan range;
  regions whose (min, max) key span — read from the sorted file's
  first/last line at plan time — cannot intersect the range are
  PRUNED before any executor reads them (the region-server scan-range
  analogue). All other predicates are returned to Spark to evaluate
  post-scan, per the API contract.

The write path appends one new sorted region file per input
partition (atomic tmp+rename, the engine's usual commit idiom).

Usage::

    spark.dataSource.register(KVStoreDataSource)
    df = (spark.read.format("kvstore")
          .option("path", "/data/kv_table")
          .option("columns", "row_key,name,qty")
          .option("columns.mapping", ":key,f:name,f:qty")
          .load())
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

REGION_PREFIX = "region-"


def parse_mapping(options: dict) -> tuple[list[str], list[tuple[str, str]]]:
    """(column names, [(family, qualifier) or ("", ":key")]) from the
    ``columns`` / ``columns.mapping`` options — HBaseSerDe's
    positional-pairing rule, including its errors (mapping arity must
    match the column list; exactly one ``:key``)."""
    cols = [c.strip() for c in options.get("columns", "").split(",") if c.strip()]
    raw = [m.strip() for m in options.get("columns.mapping", "").split(",") if m.strip()]
    if not cols or not raw:
        raise ValueError(
            "kvstore requires 'columns' and 'columns.mapping' options "
            "(HBaseSerDe: hbase.columns.mapping)"
        )
    if len(cols) != len(raw):
        raise ValueError(
            f"columns.mapping has {len(raw)} entries for {len(cols)} "
            f"columns (HBaseSerDe: mapping and column list must pair)"
        )
    if raw.count(":key") != 1:
        raise ValueError("columns.mapping must contain exactly one :key")
    mapped: list[tuple[str, str]] = []
    for m in raw:
        if m == ":key":
            mapped.append(("", ":key"))
            continue
        if ":" not in m:
            raise ValueError(f"bad mapping entry {m!r} (want family:qualifier)")
        fam, qual = m.split(":", 1)
        mapped.append((fam, qual))
    return cols, mapped


def _region_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith(REGION_PREFIX) and f.endswith(".jsonl")
    )


def _region_span(fp: str) -> tuple[str, str]:
    """(min_key, max_key) of a sorted region file — first and last
    line only, never the body (plan-time metadata, like a region
    server's key range). The tail read grows until it provably holds
    one complete line — a fixed window would silently truncate a last
    line longer than it (long cell values), making the span garbage."""
    with open(fp, "rb") as fh:
        first = fh.readline()
        fh.seek(0, os.SEEK_END)
        size = fh.tell()
        back = 8192
        while True:
            fh.seek(max(0, size - back))
            lines = fh.read().splitlines()
            if len(lines) > 1 or back >= size:
                last = lines[-1]
                break
            back *= 2
    return json.loads(first)["key"], json.loads(last)["key"]


class _RegionPartition(InputPartition):
    def __init__(self, fp: str):
        self.fp = fp


class KVStoreReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.cols, self.mapping = parse_mapping(options)
        self.key_col = self.cols[self.mapping.index(("", ":key"))]
        # scan range [lo, hi]; None = unbounded; *_strict = exclusive
        self.lo: str | None = None
        self.hi: str | None = None
        self.lo_strict = False
        self.hi_strict = False

    def pushFilters(self, filters):  # noqa: N802 — API name
        """Row-key =, <, <=, >, >= become the scan range; everything
        else (and non-key columns) goes back to Spark — the
        HiveHBaseTableInputFormat key-range conversion."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            v = getattr(f, "value", None)
            if attr != (self.key_col,) or not isinstance(v, str):
                yield f  # non-key column, non-string, or a filter
                continue  # shape without a value (IsNotNull, ...)
            if isinstance(f, EqualTo):
                self._narrow_lo(v, False)
                self._narrow_hi(v, False)
            elif isinstance(f, GreaterThan):
                self._narrow_lo(v, True)
            elif isinstance(f, GreaterThanOrEqual):
                self._narrow_lo(v, False)
            elif isinstance(f, LessThan):
                self._narrow_hi(v, True)
            elif isinstance(f, LessThanOrEqual):
                self._narrow_hi(v, False)
            else:
                yield f  # unsupported key predicate: Spark evaluates

    def _narrow_lo(self, v: str, strict: bool) -> None:
        if self.lo is None or v > self.lo or (v == self.lo and strict):
            self.lo, self.lo_strict = v, strict

    def _narrow_hi(self, v: str, strict: bool) -> None:
        if self.hi is None or v < self.hi or (v == self.hi and strict):
            self.hi, self.hi_strict = v, strict

    def _key_in_range(self, k: str) -> bool:
        if self.lo is not None and (k < self.lo or (k == self.lo and self.lo_strict)):
            return False
        if self.hi is not None and (k > self.hi or (k == self.hi and self.hi_strict)):
            return False
        return True

    def partitions(self):
        """One partition per region file, PRUNED by the pushed key
        range against each region's sorted (min, max) span — a pruned
        region is never opened by any executor."""
        files = _region_files(self.path)
        if self.lo is None and self.hi is None:
            # nothing pushed: no span metadata needed — don't pay
            # plan-time driver I/O per region for nothing (review r11)
            return [_RegionPartition(fp) for fp in files] or [
                _RegionPartition("")
            ]
        parts = []
        for fp in files:
            mn, mx = _region_span(fp)
            if self.lo is not None and (mx < self.lo or (mx == self.lo and self.lo_strict)):
                continue
            if self.hi is not None and (mn > self.hi or (mn == self.hi and self.hi_strict)):
                continue
            parts.append(_RegionPartition(fp))
        # zero surviving regions still needs ONE empty partition (the
        # API requires a non-empty partition list)
        return parts or [_RegionPartition("")]

    def read(self, partition: _RegionPartition) -> Iterator[tuple]:
        if not partition.fp:
            return
        with open(partition.fp) as fh:
            for line in fh:
                rec = json.loads(line)
                k = rec["key"]
                if not self._key_in_range(k):
                    continue
                out = []
                for col, (fam, qual) in zip(self.cols, self.mapping):
                    if qual == ":key":
                        out.append(k)
                    else:
                        out.append(rec.get("cells", {}).get(f"{fam}:{qual}"))
                yield tuple(out)


class _RegionCommit(WriterCommitMessage):
    def __init__(self, tmp: str):
        self.tmp = tmp


class KVStoreWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.cols, self.mapping = parse_mapping(options)

    def write(self, iterator) -> _RegionCommit:
        """One HIDDEN .tmp file per task attempt; publish happens in
        commit(), never here — a task-time rename would make a lost or
        speculative attempt's region visible forever and duplicate its
        rows (review r11). Keys and cells are stringified on write:
        the store's declared schema (and the span ordering
        partitions() depends on) is all-string — the HBaseSerDe
        bytes-as-string default — and a raw int key would poison every
        later filtered scan with a str-vs-int comparison at plan time
        (review r11)."""
        os.makedirs(self.path, exist_ok=True)
        recs = []
        for row in iterator:
            cells = {}
            key = None
            for col, (fam, qual) in zip(self.cols, self.mapping):
                v = row[col]
                if qual == ":key":
                    if v is None:
                        raise ValueError("kvstore write: NULL row key")
                    key = str(v)
                elif v is not None:
                    cells[f"{fam}:{qual}"] = str(v)
            recs.append({"key": key, "cells": cells})
        if not recs:
            return _RegionCommit("")
        recs.sort(key=lambda r: r["key"])  # regions are key-sorted
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            for r in recs:
                fh.write(json.dumps(r) + "\n")
        return _RegionCommit(tmp)

    def commit(self, messages):
        # job-level publish: only attempts whose commit message reached
        # the driver are renamed into visibility (rename is atomic per
        # file; driver and executors share the store filesystem — the
        # simulation boundary). Readers never see an uncommitted or
        # duplicated attempt; a lost attempt's .tmp-* stays hidden
        # (REGION_PREFIX-filtered) rather than becoming a region.
        for m in messages:
            tmp = getattr(m, "tmp", "")
            if tmp and os.path.exists(tmp):
                final = os.path.join(
                    self.path,
                    f"{REGION_PREFIX}{uuid.uuid4().hex[:12]}.jsonl",
                )
                os.rename(tmp, final)
        return None

    def abort(self, messages):
        for m in messages:
            tmp = getattr(m, "tmp", "")
            if tmp:
                try:
                    os.remove(tmp)
                except OSError:
                    pass


class KVStoreDataSource(DataSource):
    """``spark.read.format("kvstore")`` / ``df.write.format("kvstore")``
    — register once per session with
    ``spark.dataSource.register(KVStoreDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "kvstore"

    def schema(self) -> str:
        cols, mapped = parse_mapping(self.options)
        # HBase stores untyped bytes; the serde's default mapping is
        # string per cell — same here (CAST in SQL for other types).
        # Names are backtick-quoted: a qualifier mapped straight to a
        # reserved-word column ('order') must still parse (review r11)
        return ", ".join(f"`{c}` string" for c in cols)

    def reader(self, schema: StructType) -> KVStoreReader:
        return KVStoreReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> KVStoreWriter:
        if overwrite:
            raise ValueError(
                "kvstore supports append only (HBase semantics: puts, "
                "never table truncation through the handler)"
            )
        return KVStoreWriter(schema, self.options)


def register(spark) -> None:
    """Idempotent session registration. Also enables Python-source
    filter pushdown (a runtime conf, default false in Spark 4.1):
    planning a kvstore scan with pushdown disabled is an ERROR by API
    contract once the reader implements pushFilters, and the key-range
    pushdown IS this connector's point."""
    if spark.conf.get(
        "spark.sql.python.filterPushdown.enabled", "false"
    ) != "true":
        # session-wide planner switch, flipped once and documented:
        # sources that do NOT implement pushFilters keep the no-op
        # base behavior either way, so enabling it only activates
        # pushdown for sources that opted in by implementing the hook
        # (review r11 — don't re-set on every read)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KVStoreDataSource)
