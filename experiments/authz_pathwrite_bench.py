"""Measured price of the STATELESS path-write gate (round 12).

enforce_path_write deliberately keeps no catalog-layout state —
review r12 broke a table-set-fingerprint cache (DROP+CREATE at a new
location evaded it) and then a per-path hint (a later inner table was
permanently shadowed), so every decision is a fresh DESCRIBE sweep
(authorization.py enforce_path_write docstring). This experiment puts
a number on that choice: per-call gate latency vs catalog size, for
the governed (deny/allow on a real table) and ungoverned (plain
filesystem path) cases.

Run: python experiments/authz_pathwrite_bench.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from amplab_hive_spark import authorization as az
    from amplab_hive_spark.session import get_spark

    spark = get_spark("authz_pathwrite_bench")
    base = tempfile.mkdtemp(prefix="authz_pw_")
    spark.conf.set("spark.sql.authz.enabled", "false")
    results = {}
    made: list[str] = []
    try:
        for n_tables in (5, 25, 100):
            while len(made) < n_tables:
                i = len(made)
                name = f"pw_bench_t{i}"
                spark.createDataFrame([(1,)], "id bigint") \
                    .write.option("path", f"{base}/{name}") \
                    .saveAsTable(name)
                made.append(name)
            spark.conf.set("user.name", "pw_bench_user")
            spark.conf.set("spark.sql.authz.enabled", "true")

            def timed(path: str, reps: int = 7) -> float:
                ts = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    try:
                        az.enforce_path_write(spark, path)
                    except PermissionError:
                        pass  # the deny IS the measured work
                    ts.append(time.perf_counter() - t0)
                return round(statistics.median(ts) * 1000, 2)

            governed = timed(f"{base}/pw_bench_t0")
            subdir = timed(f"{base}/pw_bench_t0/dt=2024-01-01")
            ungoverned = timed(f"{base}/nowhere/else")
            spark.conf.set("spark.sql.authz.enabled", "false")
            results[n_tables] = {
                "governed_ms": governed,
                "partition_subdir_ms": subdir,
                "ungoverned_ms": ungoverned,
            }
            print(f"{n_tables:4d} tables: governed {governed} ms, "
                  f"subdir {subdir} ms, ungoverned {ungoverned} ms")
    finally:
        spark.conf.set("spark.sql.authz.enabled", "false")
        for name in made:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "experiments",
                           "authz_pathwrite_r12.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print("recorded experiments/authz_pathwrite_r12.json")


if __name__ == "__main__":
    main()
