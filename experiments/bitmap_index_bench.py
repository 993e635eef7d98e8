"""Measure the EWAH bitmap index against a direct predicate scan —
and test the reference's own deprecation rationale.

Hive built bitmap indexes (ql/index/bitmap/BitmapIndexHandler.java)
for row-oriented storage where a predicate meant reading every row.
Hive 3 REMOVED the whole ql/index subsystem (HIVE-18448), reasoning
that columnar formats' predicate pushdown + min/max pruning made
index maintenance a net loss. This bench measures that claim on our
stack at sf0.1: a low-selectivity equality predicate on orders,
answered (a) by a direct parquet scan with pushdown, (b) via the
pre-built bitmap index (lookup -> position join back to the row).

Expected (and honest) outcome: the direct scan wins or ties at any
realistic selectivity, because the scan is already pruned to one
column's pages while the index path pays a join; the index's
historical win condition (full-row reads on RCFile-era storage) is
gone. One JSON line with both timings, the index build cost, and
the verdict.

Run: ``python experiments/bitmap_index_bench.py``.
"""

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amplab_hive_spark.functions.bitmaps import (
    bitmap_index_lookup,
    build_bitmap_index,
)
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WANTED = ["1-URGENT"]


def timed(fn, reps=3):
    best, out = 9e9, None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


def main() -> None:
    spark = get_spark("bitmap-index-bench")
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))

    def direct():
        return (orders.filter(F.col("o_orderpriority").isin(WANTED))
                .agg(F.count(F.lit(1)), F.sum("o_totalprice"))
                .collect()[0][0])

    t_build, idx = timed(
        lambda: build_bitmap_index(
            orders, "o_orderpriority", "o_orderkey", bucket_bits=16
        ).localCheckpoint(eager=True),
        reps=1,
    )

    def via_index():
        hits = bitmap_index_lookup(idx, WANTED, bucket_bits=16)
        return (orders.join(
                    hits.withColumnRenamed("position", "o_orderkey"),
                    "o_orderkey")
                .agg(F.count(F.lit(1)), F.sum("o_totalprice"))
                .collect()[0][0])

    t_direct, n_direct = timed(direct)
    t_index, n_index = timed(via_index)
    assert n_direct == n_index, (n_direct, n_index)

    print(json.dumps({
        "experiment": "bitmap_index_vs_pushdown_scan",
        "rows_selected": n_direct,
        "direct_scan_s": round(t_direct, 3),
        "index_lookup_s": round(t_index, 3),
        "index_build_s": round(t_build, 3),
        "verdict": ("direct scan wins — confirms HIVE-18448's rationale"
                    if t_direct <= t_index else
                    "index wins — pushdown insufficient here"),
        "sf_dir": SF_DIR,
    }))


if __name__ == "__main__":
    main()
