"""Measure partition-scoped UPDATE/DELETE vs full-table
copy-on-write at sf0.1.

The reference rewrites row-level ops into partition-scoped
insert-overwrite (ql/parse/UpdateDeleteSemanticAnalyzer.java); this
engine does the same via dynamic partition overwrite (ddl.py). This
experiment quantifies the claim on a day-partitioned orders table:

- table: orders at sf0.1 (150k rows) partitioned by o_day — ~2,400
  daily partitions (TPC-H order dates span ~7 years)
- op: UPDATE one day's rows
- measured: wall time AND files/rows rewritten. The quantity that
  scales is bytes rewritten (1 of ~2,400 files vs the whole table);
  wall-clock at sf0.1 actually FAVORS the full rewrite (one 4 MB
  table vs per-partition machinery over thousands of 33 KB files) —
  documented honestly, because at 100 TB the ratio inverts: the full
  path writes 100 TB, the scoped path writes one partition.

Run: ``PYTHONPATH=. python experiments/partition_dml_bench.py`` —
one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from amplab_hive_spark import ddl
from amplab_hive_spark.catalog import tables
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def data_files(root: str) -> set[tuple[str, float]]:
    out = set()
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.startswith(("_", ".")):
                p = os.path.join(dirpath, f)
                out.add((os.path.relpath(p, root), os.path.getmtime(p)))
    return out


def build(spark, wh: str, name: str, partitioned: bool):
    src = tables(spark, SF_DIR).orders.withColumn(
        "o_day", F.to_date("o_orderdate")
    )
    ddl.create_table_as(
        spark, name, src, f"{wh}/{name}",
        partition_by=["o_day"] if partitioned else (),
    )
    return f"{wh}/{name}"


def main() -> None:
    spark = get_spark("partition-dml-bench")
    wh = tempfile.mkdtemp(prefix="dmlbench_")
    try:
        scoped_path = build(spark, wh, "orders_day_scoped", partitioned=True)
        full_path = build(spark, wh, "orders_day_full", partitioned=False)
        victim_day = spark.table("orders_day_scoped").agg(
            F.min("o_day")
        ).collect()[0][0]
        cond = f"o_day = DATE '{victim_day}'"

        results = {}
        for label, table, path in (
            ("scoped", "orders_day_scoped", scoped_path),
            ("full_cow", "orders_day_full", full_path),
        ):
            before = data_files(path)
            t0 = time.perf_counter()
            n = ddl.update_table(
                spark, table, cond, {"o_orderpriority": "'0-RESCHEDULED'"}
            )
            wall = time.perf_counter() - t0
            after = data_files(path)
            results[label] = {
                "matched": n,
                "update_sec": round(wall, 3),
                "files_total": len(after),
                "files_rewritten": len(after - before),
                "files_untouched": len(after & before),
            }
        out = {
            "metric": "partition_scoped_update",
            "victim_day": str(victim_day),
            "rows_total": spark.table("orders_day_scoped").count(),
            **{f"{k}_{kk}": vv for k, v in results.items() for kk, vv in v.items()},
        }
        # The point: the scoped path left ~2,400 files untouched and
        # rewrote exactly the victim partition; the full path rewrote
        # every byte it owns (its whole file set).
        assert results["scoped"]["files_rewritten"] <= 2, out
        assert results["scoped"]["files_untouched"] >= 2000, out
        assert results["full_cow"]["files_untouched"] == 0, out
        print(json.dumps(out))
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.sql("DROP TABLE IF EXISTS orders_day_scoped")
        spark.sql("DROP TABLE IF EXISTS orders_day_full")
        spark.stop()


if __name__ == "__main__":
    main()
