"""Storage-handler extension point (sources/kvstore.py, round 11):
the HBase/Accumulo handler CAPABILITY — external table bound by a
columns mapping, region-split parallelism, row-key predicates pushed
down as scan ranges — re-expressed on Spark's Python Data Source API
(reference: hbase-handler/.../HBaseStorageHandler.java:80,
HBaseSerDe's hbase.columns.mapping,
HiveHBaseTableInputFormat's key-range conversion). The on-disk
sorted-region store is the deterministic simulation boundary (no
HBase server in this environment — same honesty rule as the
multimodal decoder stub); everything Spark-side is real and
asserted here, including that region PRUNING actually prevents
executors from opening out-of-range regions (the poison-region
proof)."""

import json
import os
import time

import pytest

from amplab_hive_spark.engine import Engine
from amplab_hive_spark.sources import kvstore

COLUMNS = "row_key,name,qty"
MAPPING = ":key,f:name,f:qty"


def _write_region(path: str, idx: int, keys: list[str]) -> str:
    fp = os.path.join(path, f"{kvstore.REGION_PREFIX}{idx:05d}.jsonl")
    with open(fp, "w") as fh:
        for k in keys:
            fh.write(json.dumps(
                {"key": f"k{k}", "cells": {"f:name": f"n_{k}", "f:qty": str(ord(k))}}
            ) + "\n")
    return fp


@pytest.fixture()
def store(spark, tmp_path):
    d = str(tmp_path / "kv_table")
    os.makedirs(d)
    _write_region(d, 0, ["a", "b", "c"])
    _write_region(d, 1, ["d", "e", "f"])
    _write_region(d, 2, ["g", "h", "k"])
    kvstore.register(spark)
    return d


def _load(spark, d, pruning=None):
    """Raw .load(); pruning stays the connector DEFAULT (off — the
    reuse-safe posture, r13) unless a test opts in to prove the
    pruning machinery itself."""
    r = (
        spark.read.format("kvstore").option("path", d)
        .option("columns", COLUMNS).option("columns.mapping", MAPPING)
    )
    if pruning is not None:
        r = r.option("region.pruning", pruning)
    return r.load()


def test_mapping_parse_contract():
    """HBaseSerDe's pairing rules: arity must match, exactly one :key,
    family:qualifier shape."""
    with pytest.raises(ValueError, match="must pair"):
        kvstore.parse_mapping({"columns": "a,b", "columns.mapping": ":key"})
    with pytest.raises(ValueError, match="exactly one :key"):
        kvstore.parse_mapping({"columns": "a,b", "columns.mapping": "f:x,f:y"})
    with pytest.raises(ValueError, match="family:qualifier"):
        kvstore.parse_mapping({"columns": "a,b", "columns.mapping": ":key,noq"})
    cols, mapped = kvstore.parse_mapping(
        {"columns": COLUMNS, "columns.mapping": MAPPING}
    )
    assert cols == ["row_key", "name", "qty"]
    assert mapped == [("", ":key"), ("f", "name"), ("f", "qty")]


def test_full_scan_and_column_family_mapping(spark, store):
    rows = {r.row_key: (r.name, r.qty) for r in _load(spark, store).collect()}
    assert len(rows) == 9
    assert rows["ka"] == ("n_a", "97")
    assert rows["kk"] == ("n_k", "107")
    # one partition per region
    assert _load(spark, store).rdd.getNumPartitions() == 3


def test_key_range_pushdown_rows(spark, store):
    got = sorted(
        r.row_key
        for r in _load(spark, store)
        .filter("row_key >= 'kd' AND row_key < 'kg'").collect()
    )
    assert got == ["kd", "ke", "kf"]
    assert _load(spark, store).filter("row_key = 'kh'").count() == 1
    assert _load(spark, store).filter("row_key > 'zz'").count() == 0


def test_nonkey_predicates_stay_with_spark(spark, store):
    """Non-key filters are returned from pushFilters for Spark to
    evaluate post-scan — results must still be exact."""
    assert _load(spark, store).filter("name = 'n_e'").count() == 1
    assert _load(spark, store).filter("qty = '103'").first().row_key == "kg"


def test_poison_region_proves_pruning(spark, store):
    """The scan-range proof: a region whose key span lies outside the
    pushed range has CORRUPT middle rows — the range query succeeds
    (the region is pruned at plan time, no executor opens its body),
    while an unfiltered scan of the same store fails. File existence
    alone can't fake this."""
    poison = os.path.join(store, f"{kvstore.REGION_PREFIX}00009.jsonl")
    with open(poison, "w") as fh:
        fh.write(json.dumps({"key": "kx", "cells": {"f:name": "ok"}}) + "\n")
        fh.write("THIS IS NOT JSON\n")
        fh.write(json.dumps({"key": "kz", "cells": {"f:name": "ok"}}) + "\n")
    got = sorted(
        r.row_key
        for r in _load(spark, store, pruning="true")
        .filter("row_key >= 'kb' AND row_key <= 'ke'").collect()
    )
    assert got == ["kb", "kc", "kd", "ke"]  # pruned: poison never read
    with pytest.raises(Exception):  # noqa: B017 — worker-side JSON error
        _load(spark, store).count()
    os.remove(poison)


def test_write_roundtrip_and_sorted_regions(spark, store):
    src = spark.createDataFrame(
        [("kz2", "w2", "9"), ("kz1", "w1", "8")],
        "row_key string, name string, qty string",
    )
    (
        src.write.format("kvstore").option("path", store)
        .option("columns", COLUMNS).option("columns.mapping", MAPPING)
        .mode("append").save()
    )
    got = {r.row_key: r.name for r in
           _load(spark, store).filter("row_key >= 'kz'").collect()}
    assert got == {"kz1": "w1", "kz2": "w2"}
    # new region files are key-sorted (the store invariant the span
    # metadata depends on)
    for fp in kvstore._region_files(store):
        keys = [json.loads(line)["key"] for line in open(fp)]
        assert keys == sorted(keys)
    # overwrite is refused (HBase semantics: puts only)
    with pytest.raises(Exception, match="append only"):
        (
            src.write.format("kvstore").option("path", store)
            .option("columns", COLUMNS).option("columns.mapping", MAPPING)
            .mode("overwrite").save()
        )


def test_sql_join_against_parquet(spark, store, sf_dir):
    """The storage-handler story: the external kv table is a first-
    class SQL relation — joinable with warehouse tables through the
    Engine surface."""
    eng = Engine(spark)
    eng.read_kvstore(store, COLUMNS, MAPPING).createOrReplaceTempView("kv_ext")
    from amplab_hive_spark.catalog import tables

    tables(spark, sf_dir)
    try:
        row = eng.sql(
            "SELECT COUNT(*) AS n FROM kv_ext k JOIN nation n "
            "ON CAST(k.qty AS INT) - 90 = n.n_nationkey"
        ).first()
        assert row.n > 0
    finally:
        spark.catalog.dropTempView("kv_ext")


def test_region_span_long_last_line(spark, tmp_path):
    """Review r11: the span's tail read must not truncate a last line
    longer than its initial window — a 100 KB cell in the final row is
    legal and its key must still bound the region."""
    d = str(tmp_path / "kv_long")
    os.makedirs(d)
    fp = os.path.join(d, f"{kvstore.REGION_PREFIX}00000.jsonl")
    with open(fp, "w") as fh:
        fh.write(json.dumps({"key": "ka", "cells": {"f:name": "a"}}) + "\n")
        fh.write(json.dumps(
            {"key": "kb", "cells": {"f:name": "x" * 100_000}}
        ) + "\n")
    assert kvstore._region_span(fp) == ("ka", "kb")
    kvstore.register(spark)
    got = (
        spark.read.format("kvstore").option("path", d)
        .option("columns", "row_key,name")
        .option("columns.mapping", ":key,f:name").load()
        .filter("row_key = 'kb'").count()
    )
    assert got == 1


# -- round 12 hardening: ADVICE r11 (stale pushed-range state, key
#    dup semantics, path validation) + VERDICT r11 task 4 (prefix/IN
#    pruning, missing store, concurrent-writer visibility). -------------


def test_dataframe_reuse_is_row_complete(spark, tmp_path):
    """ADVICE r11 (high): Spark 4.1 reuses the LAST planned scan for
    a no-filter action on a shared load(). The connector consumes no
    filters and read() never drops rows, so a reused scan stays
    row-complete for every region it OPENS — on a single region
    spanning all keys (never prunable) the ADVICE repro sequence now
    returns every row; the r11 code returned only the last range's
    rows (stale lo/hi row-filtering inside read())."""
    d = str(tmp_path / "kv_onereg")
    os.makedirs(d)
    _write_region(d, 0, ["a", "b", "c", "d", "e", "f"])
    kvstore.register(spark)
    df = _load(spark, d)
    assert df.filter("row_key >= 'kd'").count() == 3
    assert df.filter("row_key <= 'kb'").count() == 2
    assert df.count() == 6


def test_dataframe_reuse_default_is_loss_free(spark, tmp_path):
    """r13 (VERDICT r12 finding 1): region pruning is OPT-IN, so the
    DEFAULT raw-load posture survives the Spark 4.1 scan-reuse
    sequence with zero row loss — the ADVICE repro on a multi-region
    store now returns every row on the shared DataFrame."""
    d = str(tmp_path / "kv_safe_default")
    os.makedirs(d)
    _write_region(d, 0, ["a", "b"])
    _write_region(d, 1, ["x", "y"])
    kvstore.register(spark)
    df = _load(spark, d)
    assert df.filter("row_key <= 'kb'").count() == 2
    assert df.count() == 4  # no pruned-region residual: default is off


def test_dataframe_reuse_pruning_residual_is_opt_in(spark, tmp_path):
    """The residual survives ONLY under explicit region.pruning=true
    — the rationale pin for the opt-in default: a stale scan can omit
    an ENTIRE region the earlier query's range pruned. Pinned at the
    observed Spark 4.1.2 behavior (a no-filter action replays the
    last planned scan), with the fresh-load remedy that makes the
    Engine path safe."""
    d = str(tmp_path / "kv_resid")
    os.makedirs(d)
    _write_region(d, 0, ["a", "b"])
    _write_region(d, 1, ["x", "y"])
    kvstore.register(spark)
    df = _load(spark, d, pruning="true")
    assert df.filter("row_key <= 'kb'").count() == 2  # prunes region 1
    n = df.count()
    # 2 = the documented Spark 4.1 scan-reuse residual (stale pruning);
    # 4 = a future Spark that re-plans filterless actions. Anything
    # else is a connector bug.
    assert n in (2, 4)
    # the remedy pruning callers must follow: a fresh load per query
    assert _load(spark, d, pruning="true").count() == 4


def test_prefix_pushdown_prunes(spark, store):
    """LIKE 'prefix%' (StringStartsWith) becomes a prefix scan range
    (HBase setRowPrefixFilter) — proven the poison way: a corrupt
    region outside the prefix range is never opened."""
    poison = os.path.join(store, f"{kvstore.REGION_PREFIX}00009.jsonl")
    with open(poison, "w") as fh:
        fh.write(json.dumps({"key": "zx", "cells": {"f:name": "ok"}}) + "\n")
        fh.write("THIS IS NOT JSON\n")
        fh.write(json.dumps({"key": "zz", "cells": {"f:name": "ok"}}) + "\n")
    try:
        got = sorted(
            r.row_key
            for r in _load(spark, store, pruning="true")
            .filter("row_key LIKE 'kd%'").collect()
        )
        assert got == ["kd"]
        with pytest.raises(Exception):  # noqa: B017 — poison read
            _load(spark, store).count()
    finally:
        os.remove(poison)


def test_in_list_pushdown_prunes(spark, store):
    """IN-lists prune every region whose span contains none of the
    listed keys (multi-range analogue) — same poison proof."""
    poison = os.path.join(store, f"{kvstore.REGION_PREFIX}00009.jsonl")
    with open(poison, "w") as fh:
        fh.write(json.dumps({"key": "zx", "cells": {"f:name": "ok"}}) + "\n")
        fh.write("THIS IS NOT JSON\n")
        fh.write(json.dumps({"key": "zz", "cells": {"f:name": "ok"}}) + "\n")
    try:
        got = sorted(
            r.row_key
            for r in _load(spark, store, pruning="true")
            .filter("row_key IN ('ka', 'kh')").collect()
        )
        assert got == ["ka", "kh"]
    finally:
        os.remove(poison)


def test_missing_store_and_missing_path_option(spark, tmp_path):
    """VERDICT r11 finding 2: a store directory that does not exist
    yet is the HBase empty-table case — an empty scan, not a plan-time
    FileNotFoundError; a missing 'path' option is a descriptive
    connector error, not a KeyError."""
    kvstore.register(spark)
    df = _load(spark, str(tmp_path / "never_written"))
    assert df.count() == 0
    assert df.filter("row_key > 'a'").count() == 0
    with pytest.raises(Exception, match="requires a 'path' option"):
        (
            spark.read.format("kvstore")
            .option("columns", COLUMNS).option("columns.mapping", MAPPING)
            .load().collect()
        )
    with pytest.raises(Exception, match="requires a 'path' option"):
        kvstore.KVStoreWriter(None, {"columns": COLUMNS,
                                     "columns.mapping": MAPPING})


def test_job_commit_is_all_or_nothing(spark, tmp_path):
    """Concurrent-writer visibility (VERDICT r11 task 4): a job's
    regions become visible via ONE manifest rename — a reader planned
    mid-commit (after task files exist, before the manifest) sees NONE
    of them; after commit it sees ALL, atomically."""
    d = str(tmp_path / "kv_atomic")
    kvstore.register(spark)
    opts = {"path": d, "columns": COLUMNS, "columns.mapping": MAPPING}
    w = kvstore.KVStoreWriter(None, opts)
    # two task attempts of one job, written but not committed
    m1 = w.write(iter([{"row_key": "ka", "name": "n", "qty": "1"}]))
    m2 = w.write(iter([{"row_key": "kz", "name": "n", "qty": "2"}]))
    assert _load(spark, d).count() == 0  # mid-commit reader: NOTHING
    assert kvstore._region_files(d) == []
    w.commit([m1, m2])
    assert _load(spark, d).count() == 2  # post-commit: the whole job
    assert len(kvstore._region_files(d)) == 2


def test_duplicate_key_versions_and_latest_read(spark, tmp_path):
    """ADVICE r11 (low): a key written by two jobs is TWO committed
    versions — the default read returns both (append-only store, an
    HBase all-VERSIONS raw scan), and Engine.read_kvstore(latest=True)
    resolves newest-wins per key in commit order (HBase's default
    read semantics)."""
    d = str(tmp_path / "kv_versions")
    kvstore.register(spark)
    eng = Engine(spark)

    def put(key, name):
        (
            spark.createDataFrame([(key, name, "0")],
                                  "row_key string, name string, qty string")
            .coalesce(1).write.format("kvstore").option("path", d)
            .option("columns", COLUMNS).option("columns.mapping", MAPPING)
            .mode("append").save()
        )

    put("ka", "first")
    put("kb", "only")
    put("ka", "second")
    raw = eng.read_kvstore(d, COLUMNS, MAPPING)
    assert raw.count() == 3
    assert raw.filter("row_key = 'ka'").count() == 2
    latest = eng.read_kvstore(d, COLUMNS, MAPPING, latest=True)
    got = {r.row_key: r.name for r in latest.collect()}
    assert got == {"ka": "second", "kb": "only"}
    assert latest.columns == ["row_key", "name", "qty"]  # seq dropped


def test_failed_commit_leaves_no_orphan_segments(spark, tmp_path, monkeypatch):
    """Review r12: a commit dying between segment renames and the
    manifest publish must clean its renamed segments up — abort()
    only knows .tmp paths."""
    d = str(tmp_path / "kv_failcommit")
    opts = {"path": d, "columns": COLUMNS, "columns.mapping": MAPPING}
    w = kvstore.KVStoreWriter(None, opts)
    m1 = w.write(iter([{"row_key": "ka", "name": "n", "qty": "1"}]))
    m2 = w.write(iter([{"row_key": "kb", "name": "n", "qty": "2"}]))
    real_rename = os.rename

    def failing_rename(src, dst):
        if "manifest-" in os.path.basename(dst):
            raise OSError("injected manifest publish failure")
        return real_rename(src, dst)

    monkeypatch.setattr(kvstore.os, "rename", failing_rename)
    with pytest.raises(OSError, match="injected"):
        w.commit([m1, m2])
    monkeypatch.setattr(kvstore.os, "rename", real_rename)
    leftovers = [f for f in os.listdir(d)
                 if f.startswith(kvstore.SEG_PREFIX)
                 or f.startswith(".manifest-")]
    assert leftovers == []  # renamed segments AND the manifest tmp unwound
    assert kvstore._region_files(d) == []  # nothing visible
    # a retried job commits cleanly afterwards
    m3 = w.write(iter([{"row_key": "kc", "name": "n", "qty": "3"}]))
    w.commit([m3])
    assert len(kvstore._region_files(d)) == 1


# -- round 12: store compaction + vacuum (HBase compaction analogue;
#    checkpoint-published, concurrent-writer safe). ---------------------


def _put(spark, d, key, name):
    (
        spark.createDataFrame([(key, name, "0")],
                              "row_key string, name string, qty string")
        .coalesce(1).write.format("kvstore").option("path", d)
        .option("columns", COLUMNS).option("columns.mapping", MAPPING)
        .mode("append").save()
    )


def test_compact_minor_preserves_versions(spark, tmp_path):
    """Minor compaction is a pure LAYOUT change: fewer regions, every
    version of every key preserved, newest-wins still correct."""
    d = str(tmp_path / "kv_cmin")
    kvstore.register(spark)
    eng = Engine(spark)
    for key, name in (("ka", "a1"), ("kb", "b1"), ("ka", "a2"), ("kc", "c1")):
        _put(spark, d, key, name)
    assert len(kvstore._region_files(d)) == 4
    stats = eng.compact_kvstore(d, mode="minor")
    assert stats == {"regions_in": 4, "regions_out": 1, "rows": 4}
    assert len(kvstore._region_files(d)) == 1
    raw = eng.read_kvstore(d, COLUMNS, MAPPING)
    assert raw.count() == 4  # all versions survive
    got = {r.row_key: r.name
           for r in eng.read_kvstore(d, COLUMNS, MAPPING, latest=True).collect()}
    assert got == {"ka": "a2", "kb": "b1", "kc": "c1"}
    # the merged region is key-sorted (the span invariant)
    keys = [json.loads(line)["key"]
            for line in open(kvstore._region_files(d)[0])]
    assert keys == sorted(keys)


def test_compact_major_folds_versions_and_vacuum(spark, tmp_path):
    """Major compaction keeps the newest put per key (HBase version
    GC); vacuum removes everything the checkpoint superseded without
    changing what readers see."""
    d = str(tmp_path / "kv_cmaj")
    kvstore.register(spark)
    eng = Engine(spark)
    for key, name in (("ka", "a1"), ("ka", "a2"), ("kb", "b1"),
                      ("ka", "a3"), ("kb", "b2")):
        _put(spark, d, key, name)
    stats = eng.compact_kvstore(d, mode="major")
    assert stats["regions_in"] == 5 and stats["rows"] == 2
    got = {r.row_key: r.name
           for r in eng.read_kvstore(d, COLUMNS, MAPPING).collect()}
    assert got == {"ka": "a3", "kb": "b2"}
    # a post-compaction write layers on top
    _put(spark, d, "ka", "a4")
    latest = {r.row_key: r.name
              for r in eng.read_kvstore(d, COLUMNS, MAPPING, latest=True).collect()}
    assert latest["ka"] == "a4"
    before = set(os.listdir(d))
    # the age floor protects young files (in-flight commits) ...
    assert kvstore.vacuum_store(d) == 0
    # ... and an aged-out store reclaims
    removed = kvstore.vacuum_store(d, min_age_s=0)
    assert removed > 0
    assert eng.read_kvstore(d, COLUMNS, MAPPING).count() == 3  # unchanged
    # superseded manifests/segments gone, live files kept
    after = set(os.listdir(d))
    assert after < before


def test_compact_excludes_concurrent_commits(spark, tmp_path, monkeypatch):
    """The exactly-once rule: a job whose manifest lands AFTER the
    compactor's directory listing stays OUT of the fold and VISIBLE
    after the checkpoint — supersession is by the exact set of folded
    manifest NAMES, never stamp comparison, so even a manifest STAMPED
    before the fold but renamed late survives (review r12 pass 6
    killed the stamp design). Driven deterministically by injecting a
    STALE listing: kb's manifest exists on disk with an early stamp,
    but the compactor does not see it."""
    d = str(tmp_path / "kv_conc")
    kvstore.register(spark)
    eng = Engine(spark)
    _put(spark, d, "ka", "a1")
    _put(spark, d, "kb", "b1")
    # kb's manifest is the LAST commit; hide it from the compactor's
    # listing — the worst case, since its stamp is in the folded past
    # by the time the checkpoint lands
    kb_manifest = sorted(
        f for f in os.listdir(d) if f.startswith(kvstore.MANIFEST_PREFIX)
    )[-1]
    real_listdir = os.listdir

    def stale_listdir(p):
        names = real_listdir(p)
        if os.path.abspath(p) == os.path.abspath(d):
            names = [n for n in names if n != kb_manifest]
        return names

    monkeypatch.setattr(kvstore.os, "listdir", stale_listdir)
    stats = kvstore.compact_store(d, mode="minor")
    monkeypatch.setattr(kvstore.os, "listdir", real_listdir)
    assert stats["regions_in"] == 1 and stats["rows"] == 1  # only ka folded
    got = sorted(r.row_key
                 for r in eng.read_kvstore(d, COLUMNS, MAPPING).collect())
    assert got == ["ka", "kb"]  # exactly once each — kb survived
    # and vacuum keeps the unfolded manifest's segment
    kvstore.vacuum_store(d, min_age_s=0)
    got = sorted(r.row_key
                 for r in eng.read_kvstore(d, COLUMNS, MAPPING).collect())
    assert got == ["ka", "kb"]


def test_compact_pruning_and_split_regions(spark, tmp_path):
    """Post-compaction regions keep the span invariant: pruning still
    skips a poison region outside the pushed range, and a small
    rows_per_region splits the fold into multiple sorted regions."""
    d = str(tmp_path / "kv_csplit")
    kvstore.register(spark)
    for key in ("ka", "kb", "kc", "kd"):
        _put(spark, d, key, f"n_{key}")
    stats = kvstore.compact_store(d, rows_per_region=2)
    assert stats["regions_out"] == 2
    kvstore.vacuum_store(d, min_age_s=0)
    # poison the SECOND region's span area via a fresh put far away,
    # then corrupt it on disk — a ranged read below kb never opens it
    _put(spark, d, "zz", "poison_host")
    target = kvstore._region_files(d)[-1]
    with open(target, "w") as fh:
        fh.write(json.dumps({"key": "zx", "cells": {}}) + "\n")
        fh.write("NOT JSON\n")
        fh.write(json.dumps({"key": "zz", "cells": {}}) + "\n")
    got = sorted(
        r.row_key for r in _load(spark, d, pruning="true")
        .filter("row_key <= 'kb'").collect()
    )
    assert got == ["ka", "kb"]
    with pytest.raises(Exception):  # noqa: B017 — unfiltered hits poison
        _load(spark, d).count()


def test_compact_staged_merge_respects_fd_limit(spark, tmp_path, monkeypatch):
    """A badly fragmented store (many micro-regions) compacts in
    staged passes of max_open_files streams — the motivating scenario
    must not die on the fd limit (review r12 pass 6). Verified by
    capping concurrently open region files at the stage size."""
    d = str(tmp_path / "kv_frag")
    os.makedirs(d)
    # 23 legacy micro-regions with interleaved + duplicate keys
    for i in range(23):
        fp = os.path.join(d, f"{kvstore.REGION_PREFIX}{i:05d}.jsonl")
        with open(fp, "w") as fh:
            fh.write(json.dumps(
                {"key": f"k{i % 7:02d}", "cells": {"f:name": f"v{i}"}}
            ) + "\n")
    open_files = set()
    peak = [0]
    import builtins
    real_builtin_open = builtins.open

    def counting_open(fp, *a, **kw):
        fh = real_builtin_open(fp, *a, **kw)
        if isinstance(fp, str) and "/kv_frag/" in fp and "region-" in fp:
            open_files.add(id(fh))
            peak[0] = max(peak[0], len(open_files))
            real_close = fh.close

            def close():
                open_files.discard(id(fh))
                real_close()
            fh.close = close
        return fh

    monkeypatch.setattr(builtins, "open", counting_open)
    stats = kvstore.compact_store(d, mode="minor", max_open_files=5)
    monkeypatch.setattr(builtins, "open", real_builtin_open)
    assert stats["regions_in"] == 23 and stats["rows"] == 23
    assert peak[0] <= 6  # never more than one stage's streams open
    kvstore.register(spark)
    eng = Engine(spark)
    raw = eng.read_kvstore(d, "row_key,name", ":key,f:name")
    assert raw.count() == 23  # minor: every version survives
    # newest-wins after the staged fold: key k01 was written by
    # i=1,8,15,22 -> v22 is newest
    latest = {r.row_key: r.name for r in
              eng.read_kvstore(d, "row_key,name", ":key,f:name",
                               latest=True).collect()}
    assert latest["k01"] == "v22"
    assert len(latest) == 7


def test_compact_and_vacuum_gated_under_governed_path(
    spark, tmp_path
):
    """Engine.compact_kvstore / vacuum_kvstore under enforcement: a
    store directory UNDER a governed table's location takes the
    UPDATE+DELETE maintenance bar (major compaction + vacuum destroy
    history); a store backing no catalog table stays plain filesystem
    space."""
    from amplab_hive_spark import authorization as az

    eng = Engine(spark)
    loc = str(tmp_path / "gov_tbl")
    spark.sql("DROP TABLE IF EXISTS kv_gov_tbl")
    spark.createDataFrame([(1,)], "id bigint") \
        .write.option("path", loc).saveAsTable("kv_gov_tbl")
    inside = f"{loc}/kv_side_store"
    outside = str(tmp_path / "free_store")
    kvstore.register(spark)
    _put(spark, inside, "ka", "a1")
    _put(spark, outside, "ka", "a1")
    spark.conf.set("spark.sql.authz.enabled", "true")
    spark.conf.set("user.name", "kv_maint_user")
    try:
        with pytest.raises(PermissionError, match=r"kv_gov_tbl"):
            eng.compact_kvstore(inside, mode="major")
        with pytest.raises(PermissionError, match=r"kv_gov_tbl"):
            eng.vacuum_kvstore(inside)
        # ungoverned store: plain filesystem space
        assert eng.compact_kvstore(outside)["rows"] == 1
        spark.conf.set("spark.sql.authz.enabled", "false")
        eng.sql("GRANT UPDATE, DELETE ON kv_gov_tbl TO USER kv_maint_user")
        spark.conf.set("spark.sql.authz.enabled", "true")
        assert eng.compact_kvstore(inside, mode="major")["rows"] == 1
    finally:
        spark.conf.unset("spark.sql.authz.enabled")
        try:
            spark.conf.unset("user.name")
        except Exception:
            pass
        spark.sql("DROP TABLE IF EXISTS kv_gov_tbl")
        p = az._store_path(spark)
        if os.path.exists(p):
            os.remove(p)


def test_legacy_stamp_checkpoint_fallback(spark, tmp_path):
    """Review r12 pass 7: a checkpoint written by the stamp-era format
    (no 'folded' key) must still supersede the manifests stamped at or
    before it — treating it as having folded NOTHING resurrects every
    pre-checkpoint manifest as duplicate rows."""
    d = str(tmp_path / "kv_legacy_cp")
    kvstore.register(spark)
    eng = Engine(spark)
    _put(spark, d, "ka", "a1")
    # fold by the CURRENT code, then strip the checkpoint back to the
    # legacy shape (segments+mode only)
    kvstore.compact_store(d, mode="minor")
    cp_name = [f for f in os.listdir(d)
               if f.startswith(kvstore.CHECKPOINT_PREFIX)][0]
    cp_path = os.path.join(d, cp_name)
    cp = json.load(open(cp_path))
    assert "folded" in cp
    legacy = {"segments": cp["segments"], "mode": cp["mode"]}
    with open(cp_path, "w") as fh:
        json.dump(legacy, fh)
    # the folded manifest is still on disk (no vacuum): the legacy
    # fallback must keep it superseded
    assert eng.read_kvstore(d, COLUMNS, MAPPING).count() == 1
    # a commit AFTER the legacy checkpoint stays visible (its stamp is
    # later than the checkpoint's)
    _put(spark, d, "kb", "b1")
    got = sorted(r.row_key
                 for r in eng.read_kvstore(d, COLUMNS, MAPPING).collect())
    assert got == ["ka", "kb"]
    # vacuum under the fallback reclaims the folded manifest only
    kvstore.vacuum_store(d, min_age_s=0)
    got = sorted(r.row_key
                 for r in eng.read_kvstore(d, COLUMNS, MAPPING).collect())
    assert got == ["ka", "kb"]


def test_compact_rejects_bad_max_open_files(tmp_path):
    with pytest.raises(ValueError, match="max_open_files"):
        kvstore.compact_store(str(tmp_path), max_open_files=1)


# -- round 13 hardening: ADVICE r12 (vacuum vs in-flight commit) ------


def test_segment_mtime_counts_from_publish_not_write(spark, tmp_path):
    """ADVICE r12 root cause: rename PRESERVES mtime, so a slow
    write->publish window aged an in-flight segment past any vacuum
    cutoff. commit() now touches each renamed segment — its age is
    time-since-publishability, and the age floor means what the
    vacuum docstring claims."""
    import time as _time

    d = str(tmp_path / "kv_mtime")
    kvstore.register(spark)
    _put(spark, d, "ka", "a1")
    seg = kvstore._region_files(d)[0]
    # simulate the slow-task history: had rename preserved a write
    # mtime from 10 minutes ago, this assert would fail
    assert _time.time() - os.path.getmtime(seg) < 120


def test_vacuum_rescues_segment_published_mid_vacuum(spark, tmp_path, monkeypatch):
    """ADVICE r12 scenario, injected: an aged unreferenced seg-* whose
    manifest lands DURING the vacuum run must survive — the fresh
    re-listing before seg removal sees the new manifest and skips its
    segments. Without the rescue this store would serve
    FileNotFoundError forever."""
    d = str(tmp_path / "kv_rescue")
    kvstore.register(spark)
    eng = Engine(spark)
    _put(spark, d, "ka", "a1")
    _put(spark, d, "ka", "a2")
    eng.compact_kvstore(d, mode="minor")  # vacuum needs a checkpoint
    # the in-flight commit: segment renamed (and aged), manifest not
    # yet published
    seg = f"{kvstore.SEG_PREFIX}feedfacefeed.jsonl"
    with open(os.path.join(d, seg), "w") as fh:
        fh.write(json.dumps({"key": "kz", "cells": {"f:name": "late"}}) + "\n")
    old = time.time() - 3600
    os.utime(os.path.join(d, seg), (old, old))
    manifest = (f"{kvstore.MANIFEST_PREFIX}{time.time_ns():020d}-"
                f"deadbeef.json")

    real_resolve = kvstore._resolve_listing
    calls = {"n": 0}

    def resolve_and_publish(path, names):
        # publish the manifest AFTER the first (snapshot) resolution —
        # i.e. while the vacuum is mid-run
        out = real_resolve(path, names)
        calls["n"] += 1
        if calls["n"] == 1:
            with open(os.path.join(d, ".m-tmp"), "w") as fh:
                json.dump({"segments": [seg]}, fh)
            os.rename(os.path.join(d, ".m-tmp"), os.path.join(d, manifest))
        return out

    monkeypatch.setattr(kvstore, "_resolve_listing", resolve_and_publish)
    kvstore.vacuum_store(d, min_age_s=0)
    monkeypatch.undo()
    assert calls["n"] >= 2, "vacuum must re-list before removing segs"
    assert os.path.exists(os.path.join(d, seg)), "published segment deleted"
    got = {r.row_key: r.name
           for r in eng.read_kvstore(d, COLUMNS, MAPPING).collect()}
    assert got.get("kz") == "late" and "ka" in got


def test_repair_store_drops_torn_manifests_only(spark, tmp_path):
    """The documented repair path: a manifest referencing deleted
    segments holds every read hostage (FileNotFoundError); repair
    drops exactly those manifests, healthy commits serve again, and a
    damaged CHECKPOINT refuses repair instead of guessing."""
    d = str(tmp_path / "kv_repair")
    kvstore.register(spark)
    eng = Engine(spark)
    _put(spark, d, "ka", "a1")
    _put(spark, d, "kb", "b1")
    # tear the second commit: delete its segment, keep its manifest
    manifests = sorted(f for f in os.listdir(d)
                       if f.startswith(kvstore.MANIFEST_PREFIX))
    with open(os.path.join(d, manifests[1])) as fh:
        torn_seg = json.load(fh)["segments"][0]
    os.remove(os.path.join(d, torn_seg))
    with pytest.raises(Exception):  # noqa: B017 — the hostage state
        eng.read_kvstore(d, COLUMNS, MAPPING).count()
    dropped = kvstore.repair_store(d)
    assert dropped == [manifests[1]]
    got = {r.row_key: r.name
           for r in eng.read_kvstore(d, COLUMNS, MAPPING).collect()}
    assert got == {"ka": "a1"}  # the healthy commit serves again
    # idempotent on a healthy store
    assert kvstore.repair_store(d) == []
    # a checkpoint with missing segments is NOT repairable metadata
    eng.compact_kvstore(d, mode="minor")
    cp = sorted(f for f in os.listdir(d)
                if f.startswith(kvstore.CHECKPOINT_PREFIX))[-1]
    with open(os.path.join(d, cp)) as fh:
        cp_seg = json.load(fh)["segments"][0]
    os.remove(os.path.join(d, cp_seg))
    with pytest.raises(RuntimeError, match="restore from backup"):
        kvstore.repair_store(d)


def test_repair_drops_corrupt_manifest_and_vacuum_stays_calm(spark, tmp_path):
    """review r13: repair_store must heal an UNPARSEABLE manifest (the
    exact damaged state it exists for) instead of crashing inside the
    listing resolver; vacuum_store on such a store removes nothing
    rather than guessing at a live set it cannot establish."""
    d = str(tmp_path / "kv_corrupt_manifest")
    kvstore.register(spark)
    eng = Engine(spark)
    _put(spark, d, "ka", "a1")
    eng.compact_kvstore(d, mode="minor")  # checkpoint, so vacuum engages
    _put(spark, d, "kb", "b1")
    # corrupt the post-checkpoint commit's manifest body
    m = sorted(f for f in os.listdir(d)
               if f.startswith(kvstore.MANIFEST_PREFIX))[-1]
    with open(os.path.join(d, m), "w") as fh:
        fh.write("{TRUNCATED GARBAGE")
    with pytest.raises(Exception):  # noqa: B017 — reads are hostage
        eng.read_kvstore(d, COLUMNS, MAPPING).count()
    assert kvstore.vacuum_store(d, min_age_s=0) == 0  # no live set: no-op
    dropped = kvstore.repair_store(d)
    assert dropped == [m]
    got = {r.row_key: r.name
           for r in eng.read_kvstore(d, COLUMNS, MAPPING).collect()}
    assert got == {"ka": "a1"}


def test_repair_and_vacuum_handle_wrong_shape_metadata(spark, tmp_path):
    """review r13 pass 2: valid JSON of the wrong SHAPE (a bare list
    where {"segments": [...]} belongs) is the same damage class as
    unparseable bytes — repair drops such a manifest, vacuum no-ops,
    and a wrong-shape CHECKPOINT refuses repair."""
    d = str(tmp_path / "kv_shape")
    kvstore.register(spark)
    eng = Engine(spark)
    _put(spark, d, "ka", "a1")
    eng.compact_kvstore(d, mode="minor")
    _put(spark, d, "kb", "b1")
    m = sorted(f for f in os.listdir(d)
               if f.startswith(kvstore.MANIFEST_PREFIX))[-1]
    with open(os.path.join(d, m), "w") as fh:
        fh.write("[1]")  # parses, but is not a manifest object
    assert kvstore.vacuum_store(d, min_age_s=0) == 0
    assert kvstore.repair_store(d) == [m]
    got = {r.row_key: r.name
           for r in eng.read_kvstore(d, COLUMNS, MAPPING).collect()}
    assert got == {"ka": "a1"}
    # wrong-shape checkpoint: fold damage, not repairable metadata
    cp = sorted(f for f in os.listdir(d)
                if f.startswith(kvstore.CHECKPOINT_PREFIX))[-1]
    with open(os.path.join(d, cp), "w") as fh:
        fh.write('{"segments": 123}')
    with pytest.raises(RuntimeError, match="restore from backup"):
        kvstore.repair_store(d)
