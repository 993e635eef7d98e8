"""Measure what small-file compaction buys: scan throughput on a
fragmented table, before vs after ddl.compact_table.

The reference runs compaction as a background service (the ACID
compactor, ql/txn/compactor/{Initiator,Worker,Cleaner}.java) because
small files tax every later scan: per-file open/footer-read overhead,
tiny row groups that defeat vectorized batching, and one-split-per-
file scheduler pressure. This experiment measures both sides of the
curve at sf0.1:

- **fragmented** (2000 files — the layout 2000 insert-dominant MERGE
  micro-batches leave behind): per-file overhead dominates;
- **over-compacted** (1 file): parallelism collapses to one task —
  compaction to a single file is NOT the goal;
- **target-sized** (ddl.compact_table with a byte target that yields
  a-few-times-the-core-count files — the role 128 MB plays at 100 TB,
  scaled to this table's 15 MB): the sweet spot.

Run: ``python experiments/compaction_bench.py`` — prints one JSON
line with file counts and best-of-3 full-scan timings at each layout,
plus the compaction's own cost. Uses a temp warehouse dir, dropped
at exit.
"""

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amplab_hive_spark import ddl
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FRAGMENTS = 2000  # micro-batch file count to fragment into
TARGET_MB = 1  # sf0.1 stand-in for the 128 MB production target


def timed_scan(spark, name) -> tuple[float, int]:
    df = spark.table(name)
    best, n = 9e9, 0
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.time()
        n = df.agg(F.count(F.lit(1)), F.sum(F.xxhash64(*df.columns))).collect()[0][0]
        best = min(best, time.time() - t0)
    return best, n


def file_count(spark, name) -> int:
    loc = ddl._table_location(spark, name)
    return sum(len(v) for v in ddl._list_data_files(spark, loc).values())


def main() -> None:
    spark = get_spark("compaction-bench")
    wh = tempfile.mkdtemp(prefix="compactbench_")
    name = "compact_bench_tbl"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        total = li.count()
        # one write, FRAGMENTS output files — the same layout that
        # many small append batches leave, built in one job
        ddl.create_table_as(spark, name, li.limit(0), f"{wh}/{name}")
        li.repartition(FRAGMENTS).write.insertInto(name)

        files_frag = file_count(spark, name)
        scan_frag, n1 = timed_scan(spark, name)

        t0 = time.time()
        stats = ddl.compact_table(spark, name, target_mb=TARGET_MB)
        compact_sec = time.time() - t0
        files_target = file_count(spark, name)
        scan_target, n2 = timed_scan(spark, name)

        # the over-compaction control: a single file loses parallelism
        ddl.compact_table(spark, name, target_mb=1 << 20)
        files_one = file_count(spark, name)
        scan_one, n3 = timed_scan(spark, name)

        assert n1 == n2 == n3 == total, "compaction must not change row count"

        print(
            json.dumps(
                {
                    "experiment": "compaction_scan_speedup",
                    "sf_dir": SF_DIR,
                    "rows": total,
                    "files_fragmented": files_frag,
                    "files_target": files_target,
                    "files_single": files_one,
                    "scan_fragmented_sec": round(scan_frag, 3),
                    "scan_target_sec": round(scan_target, 3),
                    "scan_single_sec": round(scan_one, 3),
                    "speedup_vs_fragmented": round(scan_frag / max(scan_target, 1e-9), 2),
                    "single_file_penalty": round(scan_one / max(scan_target, 1e-9), 2),
                    "compact_sec": round(compact_sec, 3),
                    "compact_stats": stats,
                }
            )
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
