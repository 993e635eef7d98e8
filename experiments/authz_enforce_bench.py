"""Measured cost of opt-in authorization enforcement (round 10).

Enforcement (spark.sql.authz.enabled=true) adds per-statement work to
Engine.sql: literal masking, the pre-parse ref scan, one _authz.json
load, catalog resolution per referenced table, and the privilege set
intersection. This experiment quantifies that against the disabled
default (one conf read) so the opt-in's price is a number, not a
guess.

Run: python experiments/authz_enforce_bench.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from amplab_hive_spark.engine import Engine  # noqa: E402
from amplab_hive_spark.session import get_spark  # noqa: E402

REPS = 300


def measure(spark, sql: str) -> float:
    """Time authorization.enforce itself — the end-to-end Engine.sql
    latency is dominated by Spark execution (~150 ms at this scale)
    whose run-to-run variance swamps the enforcement delta, so the
    gate is measured in isolation."""
    from amplab_hive_spark.authorization import enforce

    enforce(spark, sql)  # warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        enforce(spark, sql)
    return (time.perf_counter() - t0) / REPS


def main() -> None:
    import os

    from amplab_hive_spark import authorization as az

    spark = get_spark("authz_enforce_bench")
    # fresh store: the grants below are re-issued on every run
    path = az._store_path(spark)
    if os.path.exists(path):
        os.remove(path)
    spark.sql("DROP TABLE IF EXISTS authz_bench_t")
    spark.range(1000).selectExpr("id AS k", "id % 7 AS grp").write.saveAsTable(
        "authz_bench_t"
    )
    engine = Engine(spark)
    stmt = "SELECT grp, count(*) AS n FROM authz_bench_t GROUP BY grp"
    try:
        engine.sql(stmt).collect()  # warm the session

        spark.conf.set("spark.sql.authz.enabled", "false")
        off = measure(spark, stmt)

        spark.conf.set("spark.sql.authz.enabled", "true")
        spark.conf.set("user.name", "bench_admin")
        # admin fast path: one store load + role closure, no per-table work
        engine2 = Engine(spark)
        spark.conf.set("spark.sql.authz.enabled", "false")
        engine2.sql("GRANT ROLE admin TO USER bench_admin")
        spark.conf.set("spark.sql.authz.enabled", "true")
        admin = measure(spark, stmt)

        # full path: non-admin with a table grant → ref scan + resolve +
        # privilege intersection per statement
        spark.conf.set("spark.sql.authz.enabled", "false")
        engine2.sql("GRANT SELECT ON authz_bench_t TO USER bench_reader")
        spark.conf.set("user.name", "bench_reader")
        spark.conf.set("spark.sql.authz.enabled", "true")
        granted = measure(spark, stmt)

        print(f"enforce() disabled  per call: {off * 1e6:8.1f} us")
        print(f"enforce() admin     per call: {admin * 1e6:8.1f} us")
        print(f"enforce() granted   per call: {granted * 1e6:8.1f} us")
    finally:
        spark.conf.unset("spark.sql.authz.enabled")
        try:
            spark.conf.unset("user.name")
        except Exception:  # noqa: BLE001
            pass
        spark.sql("DROP TABLE IF EXISTS authz_bench_t")


if __name__ == "__main__":
    main()
