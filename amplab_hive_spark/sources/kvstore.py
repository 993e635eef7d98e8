"""Storage-handler extension point — a key-value store connector on
Spark's Python Data Source API (round 11; hardened round 12).

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
- **key-predicate pushdown as ADVISORY region pruning** (``pushFilters``,
  Spark 4.1; OPT-IN via ``region.pruning=true`` — see the caveat
  below): =, <, <=, >, >=, IN, and LIKE-prefix
  (``StringStartsWith``) on the row-key column become a scan range /
  point set; regions whose (min, max) key span — read from the sorted
  file's first/last line at plan time — cannot intersect it are PRUNED
  before any executor reads them (the region-server scan-range
  analogue). EVERY filter is returned to Spark as unsupported, so
  Spark re-evaluates them post-scan and row-level correctness NEVER
  depends on the pushed range (see the caveat below); the range's only
  job is skipping whole regions, which is sound for the planning query
  by the span argument alone.

**Write path / commit protocol**: each task writes one HIDDEN .tmp
segment; the job's commit() renames them to ``seg-*.jsonl`` and then
publishes ONE ``manifest-*.json`` naming all of them (tmp+rename, so
the manifest — and with it every region of the job — appears
atomically). A reader planned mid-commit sees ALL of a job's regions
or NONE; segments without a manifest are invisible. ``compact_store``
folds accumulated micro-regions into few large sorted ones behind an
atomic CHECKPOINT (minor keeps every version, major keeps the newest
per key — HBase compaction semantics), concurrent-writer safe by
exact-name-set supersession (never stamp comparison);
``vacuum_store`` reclaims superseded files under a Delta-VACUUM-style
age-floor retention contract. Manifest names
carry a zero-padded commit timestamp, so listing order IS commit
order — that ordering is what ``latest``-mode reads (newest put wins
per key, the HBase read semantics) resolve against via the
``seq.column`` option (engine.read_kvstore(latest=True)). The default
read returns every committed version of a key (append-only store,
like an HBase raw scan over all VERSIONS); files named
``region-*.jsonl`` directly in the store directory are accepted as
pre-manifest committed regions (and order BEFORE all manifests).

**Known Spark 4.1 caveat (ADVICE r11, reproduced + pinned in
tests/test_kvstore_handler.py)**: the JVM plans a python-datasource
scan per FILTERED query (fresh reader each time — the pushdown worker
constructs one per planning), but an action with NO filters reuses
the relation's most recently planned scan. Holding one ``load()``
result and mixing key-filtered and unfiltered actions can therefore
re-run a previously planned scan whose region PRUNING belonged to the
earlier query. Because this connector consumes no filters and never
drops rows inside read(), the reused scan is row-complete for every
region it opens — the residual exposure is an entire region pruned by
the stale range (multi-region stores only). Consequently (VERDICT
r12 finding 1) region pruning is OPT-IN: a raw ``.load()`` defaults
to ``region.pruning=false`` — every planned scan carries the full
region list, so scan reuse can never lose rows no matter how the
DataFrame is held. ``engine.read_kvstore`` opts IN with
``region.pruning=true`` because it constructs a FRESH load per call
(one plan per query — reuse cannot occur), keeping full pruning
performance on the governed path. Raw users who guarantee
one-load-per-query can opt in the same way; until the JVM-side
scan-reuse is fixed upstream, the default that can silently drop
rows is the wrong default.

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
import time
import uuid
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

REGION_PREFIX = "region-"
SEG_PREFIX = "seg-"
MANIFEST_PREFIX = "manifest-"
CHECKPOINT_PREFIX = "checkpoint-"


def _require_path(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError(
            "kvstore requires a 'path' option (the store table directory)"
        )
    return path


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


def _stamp_of(fname: str, prefix: str) -> str:
    """The zero-padded time_ns stamp embedded in a manifest /
    checkpoint name (lexicographic order = commit order)."""
    return fname[len(prefix):].split("-")[0]


def _region_files(path: str) -> list[str]:
    """Committed region files in COMMIT ORDER. Without a checkpoint:
    pre-manifest ``region-*.jsonl`` files first (filename order), then
    each manifest's segments in manifest order (manifest names embed a
    zero-padded commit timestamp, so filename order is commit order).
    With a checkpoint (compact_store): the LATEST checkpoint's
    segments — the fold of the manifests NAMED in its ``folded`` set —
    followed by the segments of every listed manifest NOT in that set.
    Supersession is by exact name set, not stamp comparison (review
    r12 pass 6: a manifest stamped before the fold but renamed into
    the directory after the compactor's listing must stay VISIBLE —
    with stamps it silently vanished). Superseded files may still sit
    in the directory until vacuum_store, and are ignored. A store
    directory that does not exist yet is the HBase empty-table case —
    zero regions, not a planning error (VERDICT r11 finding 2)."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    files, _ = _resolve_listing(path, names)
    return files


def _folded_of(path: str, cp_name: str, cp: dict, names: list[str]) -> set:
    """The checkpoint's superseded-manifest name set. A checkpoint
    written before the exact-set design (no ``folded`` key) falls back
    to its original stamp rule — every manifest stamped at or before
    it (review r12 pass 7: treating a legacy checkpoint as having
    superseded NOTHING resurrects every pre-checkpoint manifest as
    duplicate rows)."""
    if "folded" in cp:
        return set(cp["folded"])
    cp_stamp = _stamp_of(cp_name, CHECKPOINT_PREFIX)
    return {m for m in names
            if m.startswith(MANIFEST_PREFIX) and m.endswith(".json")
            and _stamp_of(m, MANIFEST_PREFIX) <= cp_stamp}


def _resolve_listing(path: str, names: list[str]) -> tuple[list[str], set]:
    """(committed region files in commit order, superseded manifest
    names) for ONE directory snapshot ``names`` — _region_files and
    compact_store must resolve from the SAME listing (review r12
    pass 7: compact_store re-listing inside the fold let a manifest
    committed between the two listings be folded but not recorded as
    folded — served twice forever)."""
    manifests = sorted(f for f in names
                       if f.startswith(MANIFEST_PREFIX) and f.endswith(".json"))
    cps = sorted(f for f in names
                 if f.startswith(CHECKPOINT_PREFIX) and f.endswith(".json"))
    out: list[str] = []
    folded: set = set()
    if cps:
        latest = cps[-1]
        with open(os.path.join(path, latest)) as fh:
            cp = json.load(fh)
        out.extend(os.path.join(path, s) for s in cp["segments"])
        folded = _folded_of(path, latest, cp, names)
        manifests = [m for m in manifests if m not in folded]
    else:
        out.extend(sorted(
            os.path.join(path, f)
            for f in names
            if f.startswith(REGION_PREFIX) and f.endswith(".jsonl")
        ))
    for mf in manifests:
        with open(os.path.join(path, mf)) as fh:
            segs = json.load(fh)["segments"]
        out.extend(os.path.join(path, s) for s in segs)
    return out, folded


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
    def __init__(self, fp: str, ordinal: int = 0):
        self.fp = fp
        self.ordinal = ordinal  # commit-order position, for seq.column


class KVStoreReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = _require_path(options)
        self.cols, self.mapping = parse_mapping(options)
        self.key_col = self.cols[self.mapping.index(("", ":key"))]
        self.seq_col = options.get("seq.column") or None
        # region.pruning is OPT-IN (default false, VERDICT r12
        # finding 1): with pruning off every planned scan is the full
        # region list, so the Spark 4.1 scan-reuse caveat (module
        # docstring) cannot lose a region no matter how the load() is
        # held. engine.read_kvstore opts in (fresh load per query —
        # reuse-free by construction); raw one-load-per-query callers
        # may do the same.
        self.pruning = (
            str(options.get("region.pruning", "false")).lower() == "true"
        )
        # ADVISORY scan range [lo, hi] (None = unbounded; *_strict =
        # exclusive) + point set from IN/=: recomputed from scratch at
        # every pushFilters call, used ONLY to prune regions — never
        # to drop rows (see module docstring: Spark re-applies every
        # filter because none is consumed)
        self.lo: str | None = None
        self.hi: str | None = None
        self.lo_strict = False
        self.hi_strict = False
        self.points: set[str] | None = None  # None = unconstrained

    def pushFilters(self, filters):  # noqa: N802 — API name
        """Row-key =, <, <=, >, >=, IN, and prefix-LIKE narrow the
        advisory range / point set — the HiveHBaseTableInputFormat
        key-range conversion (prefix = HBase's setRowPrefixFilter).
        EVERY filter — including the consumed-looking ones — is
        returned as unsupported so Spark re-evaluates it post-scan:
        plan-reuse can replay a stale scan (module docstring), so
        row-level correctness must never ride on this state."""
        self.lo = self.hi = None
        self.lo_strict = self.hi_strict = False
        self.points = None
        out = []
        for f in filters:
            out.append(f)  # ALL filters stay Spark-side
            attr = getattr(f, "attribute", None)
            if attr != (self.key_col,):
                continue
            v = getattr(f, "value", None)
            if isinstance(f, In):
                vals = v or ()  # In carries its list in .value
                if vals and all(isinstance(x, str) for x in vals):
                    pts = set(vals)
                    self.points = pts if self.points is None \
                        else self.points & pts
                continue
            if not isinstance(v, str):
                continue  # non-string value, or a valueless shape
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
            elif isinstance(f, StringStartsWith):
                # prefix scan: keys in [prefix, prefix~) — any key
                # with the prefix sorts >= prefix and < the prefix
                # with its last char bumped (skip the bound if the
                # last char is the max code point; advisory anyway)
                self._narrow_lo(v, False)
                if v and ord(v[-1]) < 0x10FFFF:
                    self._narrow_hi(v[:-1] + chr(ord(v[-1]) + 1), True)
        return out

    def _narrow_lo(self, v: str, strict: bool) -> None:
        if self.lo is None or v > self.lo or (v == self.lo and strict):
            self.lo, self.lo_strict = v, strict

    def _narrow_hi(self, v: str, strict: bool) -> None:
        if self.hi is None or v < self.hi or (v == self.hi and strict):
            self.hi, self.hi_strict = v, strict

    def _span_prunable(self, mn: str, mx: str) -> bool:
        """True when the pushed range/point set PROVES the region
        [mn, mx] holds no matching key."""
        if self.lo is not None and (mx < self.lo or (mx == self.lo and self.lo_strict)):
            return True
        if self.hi is not None and (mn > self.hi or (mn == self.hi and self.hi_strict)):
            return True
        if self.points is not None and not any(
            mn <= p <= mx for p in self.points
        ):
            return True
        return False

    def partitions(self):
        """One partition per region file, PRUNED by the pushed key
        range / point set against each region's sorted (min, max)
        span — a pruned region is never opened by any executor."""
        files = _region_files(self.path)
        unconstrained = not self.pruning or (
            self.lo is None and self.hi is None and self.points is None
        )
        if unconstrained:
            # nothing pushed: no span metadata needed — don't pay
            # plan-time driver I/O per region for nothing (review r11)
            return [
                _RegionPartition(fp, i) for i, fp in enumerate(files)
            ] or [_RegionPartition("")]
        parts = []
        for i, fp in enumerate(files):
            mn, mx = _region_span(fp)
            if self._span_prunable(mn, mx):
                continue
            parts.append(_RegionPartition(fp, i))
        # zero surviving regions still needs ONE empty partition (the
        # API requires a non-empty partition list)
        return parts or [_RegionPartition("")]

    def read(self, partition: _RegionPartition) -> Iterator[tuple]:
        """Emit EVERY row of the region — no range-based row skipping:
        the pushed state is plan-advisory only, and a replayed scan
        (module docstring) must stay row-complete for the regions it
        opens. Spark applies the actual filters above the scan."""
        if not partition.fp:
            return
        with open(partition.fp) as fh:
            for line_no, line in enumerate(fh):
                rec = json.loads(line)
                k = rec["key"]
                out = []
                for col, (fam, qual) in zip(self.cols, self.mapping):
                    if qual == ":key":
                        out.append(k)
                    else:
                        out.append(rec.get("cells", {}).get(f"{fam}:{qual}"))
                if self.seq_col:
                    # commit-order total order per row: region ordinal
                    # then line number, zero-padded so STRING order is
                    # numeric order (newest-wins reads sort on this)
                    out.append(f"{partition.ordinal:010d}:{line_no:010d}")
                yield tuple(out)


class _RegionCommit(WriterCommitMessage):
    def __init__(self, tmp: str):
        self.tmp = tmp


class KVStoreWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict):
        self.path = _require_path(options)
        self.cols, self.mapping = parse_mapping(options)

    def write(self, iterator) -> _RegionCommit:
        """One HIDDEN .tmp segment per task attempt; publish happens in
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
        """Job-level ATOMIC publish: rename each surviving attempt's
        .tmp to a seg-* file (invisible to readers — only manifests
        and legacy region-* files are listed), then write ONE
        manifest naming all of them via tmp+rename. The job's regions
        become visible in a single atomic step — a reader planned
        mid-commit sees all of them or none (driver and executors
        share the store filesystem; the simulation boundary). A lost
        attempt's .tmp-* stays hidden rather than becoming a region.
        The manifest name embeds a zero-padded wall-clock nanosecond
        stamp: listing order = commit order, which is the versioning
        order newest-wins reads resolve (concurrent jobs order by
        commit clock — the store's documented tiebreak)."""
        segs: list[str] = []
        mtmp = None
        try:
            for m in messages:
                tmp = getattr(m, "tmp", "")
                if tmp and os.path.exists(tmp):
                    seg = f"{SEG_PREFIX}{uuid.uuid4().hex[:12]}.jsonl"
                    dst = os.path.join(self.path, seg)
                    os.rename(tmp, dst)
                    # rename PRESERVES the task-time mtime: touch so
                    # vacuum_store's age floor measures time since the
                    # segment became publishable, not since a possibly
                    # much earlier task wrote it (ADVICE r12 — a slow
                    # write->rename window must not age a live
                    # segment past the vacuum cutoff)
                    os.utime(dst)
                    segs.append(seg)
            if not segs:
                return None
            mtmp = os.path.join(self.path, f".manifest-{uuid.uuid4().hex}")
            with open(mtmp, "w") as fh:
                json.dump({"segments": sorted(segs)}, fh)
            final = os.path.join(
                self.path,
                f"{MANIFEST_PREFIX}{time.time_ns():020d}-"
                f"{uuid.uuid4().hex[:8]}.json",
            )
            os.rename(mtmp, final)
        except Exception:
            # a commit that dies between renaming segments and
            # publishing the manifest must not strand unreferenced
            # seg-* files — or the written-but-unrenamed .manifest-*
            # temp (review r12 pass 2) — forever; abort() only knows
            # .tmp paths. Invisible-to-readers either way; this is
            # directory hygiene, best-effort by design.
            for leftover in segs + ([os.path.basename(mtmp)] if mtmp else []):
                try:
                    os.remove(os.path.join(self.path, leftover))
                except OSError:
                    pass
            raise
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
        out = [f"`{c}` string" for c in cols]
        seq = self.options.get("seq.column")
        if seq:
            out.append(f"`{seq}` string")
        return ", ".join(out)

    def reader(self, schema: StructType) -> KVStoreReader:
        return KVStoreReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> KVStoreWriter:
        if overwrite:
            raise ValueError(
                "kvstore supports append only (HBase semantics: puts, "
                "never table truncation through the handler)"
            )
        return KVStoreWriter(schema, self.options)


def compact_store(path: str, mode: str = "minor",
                  rows_per_region: int = 100_000,
                  max_open_files: int = 200) -> dict:
    """Fold the store's committed regions into few large sorted ones —
    the HBase compaction analogue, and the cure for the micro-append
    scale failure (one tiny region per commit makes listing, span
    reads, and task scheduling O(commits), not O(data)).

    - ``minor``: every VERSION of every key is preserved, re-emitted
      in (key, commit-order) order — a pure layout change;
    - ``major``: newest version per key wins, older puts dropped
      (HBase major compaction's version GC).

    Publication is a CHECKPOINT: the merged segments land hidden, then
    one ``checkpoint-<stamp>-*.json`` rename makes them live. The
    checkpoint records the EXACT SET of manifest names it folded
    (plus any names the previous checkpoint had folded that are still
    on disk); readers serve its segments plus every manifest NOT in
    that set. Concurrent-writer safety therefore needs no clock
    agreement (review r12 pass 6 killed the stamp-partition design —
    a manifest stamped early but renamed late vanished): a job
    committing mid-compaction is simply not in the listing, so it is
    not folded and not superseded — exactly-once, no loss, no
    double-read (pinned by a stale-listing injection test). Folded
    sets stay bounded: names vacuumed away are pruned at the next
    compaction. Superseded files stay on disk for in-flight readers
    until ``vacuum_store``. Memory: a streaming heap-merge over
    key-sorted regions, STAGED in passes of ``max_open_files`` so a
    badly fragmented store (thousands of micro-regions) never exceeds
    the fd limit. One compactor at a time per store (the HBase
    one-compactor-per-region rule); two racing compactions can
    supersede each other's work but never lose a manifest.

    Returns {"regions_in": N, "regions_out": M, "rows": R}."""
    if mode not in ("minor", "major"):
        raise ValueError(f"compact mode must be minor|major, not {mode!r}")
    if max_open_files < 2:
        # a 1-file stage produces as many outputs as inputs — the
        # staged loop would never terminate (review r12 pass 7)
        raise ValueError("max_open_files must be >= 2")
    import heapq

    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return {"regions_in": 0, "regions_out": 0, "rows": 0}
    # fold inputs AND the superseded-set bookkeeping come from the
    # SAME directory snapshot: re-listing inside the fold would let a
    # manifest committed between the listings be folded into the new
    # segments yet left out of the folded set — its rows served twice
    # forever (review r12 pass 7)
    files, prior_folded = _resolve_listing(path, names)
    if not files:
        return {"regions_in": 0, "regions_out": 0, "rows": 0}
    listed_manifests = {
        f for f in names
        if f.startswith(MANIFEST_PREFIX) and f.endswith(".json")
    }
    # prune folded names whose files are gone (vacuumed) — a name can
    # never reappear (uuid suffix), so dropping it is safe and keeps
    # the set bounded by files-on-disk between vacuums
    folded = {m for m in prior_folded if m in names} | listed_manifests

    def stream(ordinal_fp):
        ordinal, fp = ordinal_fp
        with open(fp) as fh:
            for line_no, line in enumerate(fh):
                rec = json.loads(line)
                yield rec["key"], ordinal, line_no, line

    def merge_into_tmps(inputs: list[str], fold_versions: bool,
                        cap: int) -> tuple[list[str], int]:
        """One merge pass over ``inputs`` (consecutive in commit
        order) → hidden tmp files of <= cap rows; per-key version
        order is preserved because inputs are consecutive."""
        merged = heapq.merge(*(stream(x) for x in enumerate(inputs)))
        if fold_versions:
            def newest_only(it):
                prev = None
                for item in it:
                    if prev is not None and item[0] != prev[0]:
                        yield prev
                    prev = item
                if prev is not None:
                    yield prev
            merged = newest_only(merged)
        tmps: list[str] = []
        fh_out = None
        out_rows = 0
        total = 0
        try:
            for _, _, _, line in merged:
                if fh_out is None or out_rows >= cap:
                    if fh_out is not None:
                        fh_out.close()
                    tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex}")
                    tmps.append(tmp)
                    fh_out = open(tmp, "w")
                    out_rows = 0
                fh_out.write(line if line.endswith("\n") else line + "\n")
                out_rows += 1
                total += 1
            if fh_out is not None:
                fh_out.close()
        except Exception:
            if fh_out is not None:
                fh_out.close()
            for t in tmps:
                try:
                    os.remove(t)
                except OSError:
                    pass
            raise
        return tmps, total

    n_in = len(files)
    live_tmps: set[str] = set()  # every undeleted tmp, for the sweep
    segs: list[str] = []
    cp_tmp = None
    try:
        # staged pre-passes: fold consecutive chunks so no single
        # merge opens more than max_open_files streams. A pass's input
        # tmps are deleted as soon as the pass consumed them — peak
        # extra disk is ONE working copy, not one per pass level
        # (review r12 pass 7)
        inputs = files
        while len(inputs) > max_open_files:
            next_inputs: list[str] = []
            for i in range(0, len(inputs), max_open_files):
                chunk = inputs[i:i + max_open_files]
                # intermediate passes NEVER fold versions — only the
                # final pass may (major), so GC sees the global order
                tmps, _ = merge_into_tmps(chunk, False, 1 << 62)
                next_inputs.extend(tmps)
                live_tmps.update(tmps)
            if inputs is not files:  # prior pass's tmps: consumed
                for t in inputs:
                    try:
                        os.remove(t)
                    except OSError:
                        continue  # stays in live_tmps for the sweep
                    live_tmps.discard(t)
            inputs = next_inputs
        tmp_names, rows = merge_into_tmps(
            inputs, mode == "major", rows_per_region
        )
        live_tmps.update(tmp_names)
        for tmp in tmp_names:
            seg = f"{SEG_PREFIX}{uuid.uuid4().hex[:12]}.jsonl"
            dst = os.path.join(path, seg)
            os.rename(tmp, dst)
            os.utime(dst)  # age floor counts from publishability
            live_tmps.discard(tmp)
            segs.append(seg)
        cp_tmp = os.path.join(path, f".checkpoint-{uuid.uuid4().hex}")
        with open(cp_tmp, "w") as fh:
            json.dump({"segments": segs, "folded": sorted(folded),
                       "mode": mode}, fh)
        os.rename(cp_tmp, os.path.join(
            path,
            f"{CHECKPOINT_PREFIX}{time.time_ns():020d}-"
            f"{uuid.uuid4().hex[:8]}.json",
        ))
        cp_tmp = None
    except Exception:
        for leftover in segs:
            try:
                os.remove(os.path.join(path, leftover))
            except OSError:
                pass
        if cp_tmp is not None:
            try:
                os.remove(cp_tmp)
            except OSError:
                pass
        raise
    finally:
        # sweep EVERY undeleted tmp — including completed chunks of a
        # pass that later failed (review r12: same orphan class as the
        # manifest/checkpoint tmps)
        for t in live_tmps:
            try:
                os.remove(t)
            except OSError:
                pass
    return {"regions_in": n_in, "regions_out": len(segs), "rows": rows}


def vacuum_store(path: str, min_age_s: float = 600.0) -> int:
    """Delete files the LATEST checkpoint superseded: pre-checkpoint
    region-* files, manifests in its folded set, older checkpoints,
    and segments referenced by no live metadata — EXCEPT anything
    younger than ``min_age_s`` (review r12 pass 6: an in-flight
    commit's segments are renamed BEFORE their manifest lands, and an
    in-flight compaction's before its checkpoint; the age floor keeps
    a concurrent job's unreferenced-yet files alive, the Delta-VACUUM
    retention idea). Two guards make the floor sound (ADVICE r12):
    segment mtimes are TOUCHED at rename (rename preserves the write
    mtime, so a slow write->publish window would otherwise age a live
    segment past any cutoff), and unreferenced seg-* candidates are
    re-checked against a FRESH listing immediately before removal —
    a manifest/checkpoint published mid-vacuum rescues its segments,
    so the race window is the microseconds between that re-listing
    and the unlink, not the whole rename->publish span min_age_s was
    carrying alone. Still unsafe against READERS whose scan was
    planned before the vacuum (they hold the old file list) — size
    ``min_age_s`` above the longest query window. Returns the number
    of files removed; a store without a checkpoint is left untouched.

    Repair path: should a store ever serve FileNotFoundError because
    metadata references deleted segments (an aggressive manual vacuum
    plus a torn commit), ``repair_store`` drops exactly the manifests
    whose segments are gone — the affected commits' rows are lost
    (they were unreadable already); every other commit serves again.
    """
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return 0
    cps = sorted(f for f in names
                 if f.startswith(CHECKPOINT_PREFIX) and f.endswith(".json"))
    if not cps:
        return 0
    # live files and the superseded set from ONE listing snapshot,
    # legacy stamp-format checkpoints included (_folded_of). An
    # unreadable metadata file (torn concurrent state, manual damage)
    # means the live set cannot be established — vacuum nothing
    # rather than guess (review r13)
    try:
        region_paths, folded = _resolve_listing(path, names)
    except (OSError, ValueError, KeyError, TypeError, AttributeError):
        # TypeError/AttributeError: valid JSON of the wrong SHAPE
        # (review r13 pass 2 — [1] where {"segments": [...]} belongs)
        return 0
    live = {os.path.basename(fp) for fp in region_paths}
    live.add(cps[-1])
    live.update(m for m in names
                if m.startswith(MANIFEST_PREFIX) and m.endswith(".json")
                and m not in folded)
    cutoff = time.time() - max(min_age_s, 0.0)
    removed = 0
    seg_candidates: list[str] = []
    for f in names:
        if f.startswith(".") or f in live:
            continue
        if (f.startswith(REGION_PREFIX) or f.startswith(SEG_PREFIX)
                or f.startswith(MANIFEST_PREFIX)
                or f.startswith(CHECKPOINT_PREFIX)):
            fp = os.path.join(path, f)
            try:
                if os.path.getmtime(fp) > cutoff:
                    continue  # young: possibly an in-flight job's file
            except OSError:
                continue
            if f.startswith(SEG_PREFIX):
                # only seg-* can become referenced AFTER the snapshot
                # (an in-flight commit/compaction publishing its
                # metadata); region-*/manifest-*/checkpoint-*
                # supersession is monotonic — defer and re-check
                seg_candidates.append(f)
                continue
            try:
                os.remove(fp)
                removed += 1
            except OSError:
                pass
    if seg_candidates:
        # fresh listing: any segment a manifest or checkpoint now
        # references is live, no matter what the first snapshot said
        try:
            fresh = os.listdir(path)
            fresh_live = {
                os.path.basename(fp)
                for fp in _resolve_listing(path, fresh)[0]
            }
        except (OSError, ValueError, KeyError, TypeError, AttributeError):
            # a concurrent vacuum/compaction removed or replaced
            # metadata between the listing and the opens (or a
            # wrong-shape JSON landed): the fresh live set is
            # unknowable — keep every candidate (review r13; deleting
            # on stale knowledge is the bug this re-listing exists to
            # prevent)
            return removed
        for f in seg_candidates:
            if f in fresh_live:
                continue
            try:
                os.remove(os.path.join(path, f))
                removed += 1
            except OSError:
                pass
    return removed


def repair_store(path: str) -> list[str]:
    """The documented repair path (ADVICE r12): drop manifests whose
    segment files are gone (each such manifest makes EVERY read of
    the store fail with FileNotFoundError — one torn commit holds the
    whole table hostage). Returns the dropped manifest names. Rows of
    the dropped commits are lost — they were already unreadable; all
    other commits serve again. Checkpoints are never dropped here: a
    checkpoint with missing segments means the store's history itself
    was damaged below the retention contract, which no metadata edit
    can undo — that case raises instead of guessing."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    present = set(names)
    cps = sorted(f for f in names
                 if f.startswith(CHECKPOINT_PREFIX) and f.endswith(".json"))
    # folded set computed WITHOUT _resolve_listing: that helper
    # json-loads every non-folded manifest, so it would crash on the
    # corrupt-manifest state this function exists to heal (review r13)
    folded: set = set()
    if cps:
        try:
            # parse AND shape-check inside the guard: valid JSON of
            # the wrong shape ({"segments": 123}, a bare list) raises
            # TypeError/AttributeError, the same damage class as
            # unparseable bytes (review r13 pass 2)
            with open(os.path.join(path, cps[-1])) as fh:
                cp = json.load(fh)
            segments = [str(s) for s in cp["segments"]]
            folded = _folded_of(path, cps[-1], cp, names)
        except (OSError, ValueError, KeyError, TypeError,
                AttributeError) as e:
            raise RuntimeError(
                f"kvstore repair: latest checkpoint {cps[-1]} is "
                f"unreadable ({e}); the fold itself is damaged — "
                f"restore from backup, no manifest edit can repair it"
            ) from e
        missing = [s for s in segments if s not in present]
        if missing:
            raise RuntimeError(
                f"kvstore repair: latest checkpoint {cps[-1]} references "
                f"missing segments {missing}; the fold itself is damaged "
                f"— restore from backup, no manifest edit can repair it"
            )
    dropped: list[str] = []
    for m in sorted(names):
        if (not m.startswith(MANIFEST_PREFIX) or not m.endswith(".json")
                or m in folded):
            continue  # folded manifests are not read — leave them
        try:
            with open(os.path.join(path, m)) as fh:
                segs = list(json.load(fh)["segments"])
            broken = any(not isinstance(s, str) or s not in present
                         for s in segs)
        except (OSError, ValueError, KeyError, TypeError):
            broken = True  # unreadable or wrong-shape manifest
        if broken:
            try:
                os.remove(os.path.join(path, m))
                dropped.append(m)
            except OSError:
                pass
    return dropped


def register(spark) -> None:
    """Idempotent session registration. Also enables Python-source
    filter pushdown (a runtime conf, default false in Spark 4.1):
    planning a kvstore scan with pushdown disabled is an ERROR by API
    contract once the reader implements pushFilters, and the region
    pruning that pushdown drives IS this connector's point."""
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
