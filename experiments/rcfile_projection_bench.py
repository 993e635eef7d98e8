"""Measure what RCFile's columnar layout buys the reader: decoding
k of n columns should cost ~k/n of the full-row decode, because
unprojected column payloads are SKIPPED without decompression —
the format's entire reason to exist over SequenceFile rows
(reference container ql/io/RCFile.java; the RCFile paper's
motivating benchmark is exactly this projection ratio).

Setup: write sf0.1 lineitem (the fixture's 11 columns, ~600k rows)
as compressed RCFile via write_rcfile_table, then time
read+aggregate of (a) all 11 columns, (b) a 2-column projection.
A format without decode-side projection would time (b) == (a).

Run: ``python experiments/rcfile_projection_bench.py`` — one JSON
line with row counts, timings, and the projection speedup.
"""

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amplab_hive_spark.session import get_spark
from amplab_hive_spark.sources.rcfile import read_rcfile_table, write_rcfile_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROJ = ["l_orderkey", "l_extendedprice"]


def timed(fn, reps=3):
    best = 9e9
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


def main() -> None:
    spark = get_spark("rcfile-projection-bench")
    src = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    schema = src.schema
    tmp = tempfile.mkdtemp(prefix="rcfile_bench_")
    try:
        n_written = write_rcfile_table(
            src.repartition(8), tmp, compress=True)

        def scan(columns):
            df = read_rcfile_table(spark, tmp, schema, columns=columns)
            return df.agg(F.count(F.lit(1))).collect()[0][0]

        t_full, n_full = timed(lambda: scan(None))
        t_proj, n_proj = timed(lambda: scan(PROJ))
        assert n_full == n_proj == n_written
        result = {
            "experiment": "rcfile_projection",
            "rows": n_written,
            "n_columns": len(schema),
            "projected_columns": PROJ,
            "full_scan_s": round(t_full, 3),
            "projected_scan_s": round(t_proj, 3),
            "projection_speedup": round(t_full / t_proj, 2),
            "sf_dir": SF_DIR,
        }
        print(json.dumps(result))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
