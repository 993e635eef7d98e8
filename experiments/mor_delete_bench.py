"""Measure the merge-on-read vs copy-on-write DELETE trade at sf0.1.

The reference keeps both paths (delta-writing transactional deletes,
and the compactor that restores scan speed) because neither side of
the trade wins universally:

- COW (ddl.delete_from): the delete pays a partition rewrite; every
  later scan is free.
- MOR (acid.delete_mor): the delete pays one scan + a KB delta
  write; every later scan pays the anti-join until compact_mor.

This prints one JSON line with: both delete wall times, the
MOR read tax (base scan vs merged scan), compaction cost, and the
break-even scan count (how many merged reads equal the COW rewrite
premium) — the number an operator would use to schedule compaction.

Run: ``python experiments/mor_delete_bench.py``.
"""

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amplab_hive_spark import acid, ddl
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COND = "l_orderkey % 97 = 0"  # ~1% of rows


def timed(fn, reps=3):
    best, out = 9e9, None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


def scan_cost(spark, df):
    def run():
        spark.catalog.clearCache()
        return df.agg(F.count(F.lit(1)), F.sum("l_extendedprice")).collect()[0][0]

    return timed(run)


def setup_table(spark, name):
    import shutil
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a crashed previous run can orphan the managed location
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    (spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
     .repartition(32).write.saveAsTable(name))


def main() -> None:
    spark = get_spark("mor-delete-bench")

    setup_table(spark, "bench_cow")
    t_cow, n_cow = timed(
        lambda: ddl.delete_from(spark, "bench_cow", COND), reps=1)

    setup_table(spark, "bench_mor")
    t_base_scan, _ = scan_cost(spark, spark.table("bench_mor"))
    t_mor, n_mor = timed(
        lambda: acid.delete_mor(spark, "bench_mor", COND, ["l_orderkey", "l_linenumber"]),
        reps=1)
    assert n_cow == n_mor, (n_cow, n_mor)
    t_merged_scan, _ = scan_cost(spark, acid.read_mor(spark, "bench_mor"))
    t_compact, _ = timed(lambda: acid.compact_mor(spark, "bench_mor"), reps=1)
    t_post_scan, _ = scan_cost(spark, spark.table("bench_mor"))

    read_tax = max(t_merged_scan - t_base_scan, 0.0)
    breakeven = (t_cow - t_mor) / read_tax if read_tax > 0 else None
    print(json.dumps({
        "experiment": "mor_vs_cow_delete",
        "rows_deleted": n_mor,
        "cow_delete_s": round(t_cow, 3),
        "mor_delete_s": round(t_mor, 3),
        "base_scan_s": round(t_base_scan, 3),
        "merged_scan_s": round(t_merged_scan, 3),
        "read_tax_s": round(read_tax, 3),
        "compact_s": round(t_compact, 3),
        "post_compact_scan_s": round(t_post_scan, 3),
        "breakeven_scans": round(breakeven, 1) if breakeven else None,
        "sf_dir": SF_DIR,
    }))

    # --- the same trade for UPDATE (r8: acid.update_mor) -------------
    UPD = {"l_returnflag": "concat(l_returnflag, '+')"}
    setup_table(spark, "bench_cow")
    t_cow_u, n_cow_u = timed(
        lambda: ddl.update_table(spark, "bench_cow", COND, UPD), reps=1)

    setup_table(spark, "bench_mor")
    t_mor_u, n_mor_u = timed(
        lambda: acid.update_mor(
            spark, "bench_mor", COND, UPD, ["l_orderkey", "l_linenumber"]),
        reps=1)
    assert n_cow_u == n_mor_u, (n_cow_u, n_mor_u)
    t_merged_scan_u, _ = scan_cost(spark, acid.read_mor(spark, "bench_mor"))
    t_compact_u, _ = timed(lambda: acid.compact_mor(spark, "bench_mor"), reps=1)

    read_tax_u = max(t_merged_scan_u - t_base_scan, 0.0)
    breakeven_u = (t_cow_u - t_mor_u) / read_tax_u if read_tax_u > 0 else None
    print(json.dumps({
        "experiment": "mor_vs_cow_update",
        "rows_updated": n_mor_u,
        "cow_update_s": round(t_cow_u, 3),
        "mor_update_s": round(t_mor_u, 3),
        "merged_scan_s": round(t_merged_scan_u, 3),
        "read_tax_s": round(read_tax_u, 3),
        "compact_s": round(t_compact_u, 3),
        "breakeven_scans": round(breakeven_u, 1) if breakeven_u else None,
        "sf_dir": SF_DIR,
    }))
    # --- r9: many-deltas read scaling + minor compaction -------------
    # The Hive many-deltas problem (Initiator exists because reads
    # degrade as deltas accumulate): N uncompacted UPDATE statements,
    # then (a) plan size — must be O(1) in N since the batched
    # _file_seq read — (b) merged-scan wall time, (c) minor compaction
    # cost and the post-minor merged scan (base untouched).
    import re as _re

    setup_table(spark, "bench_mor")
    keys = ["l_orderkey", "l_linenumber"]
    n_txns = 12
    t0 = time.time()
    for i in range(n_txns):
        acid.update_mor(
            spark, "bench_mor", f"l_orderkey % 997 = {i}",
            {"l_returnflag": "concat(l_returnflag, '+')"}, keys)
    t_updates = time.time() - t0
    view = acid.read_mor(spark, "bench_mor")
    plan = view._jdf.queryExecution().executedPlan().toString()
    n_scans = len(_re.findall(r"Scan parquet", plan))
    t_merged_n, _ = scan_cost(spark, view)
    t_minor, n_folded = timed(
        lambda: acid.compact_mor(spark, "bench_mor", mode="minor"), reps=1)
    view2 = acid.read_mor(spark, "bench_mor")
    t_merged_post, _ = scan_cost(spark, view2)
    t_major, _ = timed(lambda: acid.compact_mor(spark, "bench_mor"), reps=1)
    print(json.dumps({
        "experiment": "mor_many_deltas_minor",
        "n_txns": n_txns,
        "updates_total_s": round(t_updates, 3),
        "plan_parquet_scans_at_n": n_scans,  # constant 3 by design
        "merged_scan_n_deltas_s": round(t_merged_n, 3),
        "minor_compact_s": round(t_minor, 3),
        "files_folded": n_folded,
        "merged_scan_post_minor_s": round(t_merged_post, 3),
        "major_compact_s": round(t_major, 3),
        "sf_dir": SF_DIR,
    }))
    for name in ("bench_cow", "bench_mor"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


if __name__ == "__main__":
    main()
