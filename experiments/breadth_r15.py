"""Breadth timing: every registered query at sf0.01 (min of N warm
collect reps) to rank the non-bench tail — the r14 table's refresh.

Usage: python experiments/breadth_r15.py [reps] > /tmp/breadth_r15.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amplab_hive_spark.registry import all_queries
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main() -> None:
    spark = get_spark("breadth-r15")
    rows = []
    for name, spec in all_queries().items():
        try:
            spec.fn(spark, SF_DIR).collect()  # warm
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                spec.fn(spark, SF_DIR).collect()
                best = min(best, time.perf_counter() - t0)
            rows.append({"q": name, "sec": round(best, 3)})
        except Exception as ex:  # noqa: BLE001
            rows.append({"q": name, "error": str(ex)[:200]})
        print(json.dumps(rows[-1]), flush=True)
    rows.sort(key=lambda r: -r.get("sec", 0))
    print(json.dumps({"slowest": rows[:20],
                      "load": [round(x, 2) for x in os.getloadavg()]}))


if __name__ == "__main__":
    main()
