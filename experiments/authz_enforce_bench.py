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

REPS = 60


def measure(engine: Engine, sql: str) -> float:
    t0 = time.perf_counter()
    for _ in range(REPS):
        engine.sql(sql).collect()
    return (time.perf_counter() - t0) / REPS


def main() -> None:
    spark = get_spark("authz_enforce_bench")
    spark.sql("DROP TABLE IF EXISTS authz_bench_t")
    spark.range(1000).selectExpr("id AS k", "id % 7 AS grp").write.saveAsTable(
        "authz_bench_t"
    )
    engine = Engine(spark)
    stmt = "SELECT grp, count(*) AS n FROM authz_bench_t GROUP BY grp"
    try:
        # warmup
        engine.sql(stmt).collect()

        spark.conf.set("spark.sql.authz.enabled", "false")
        off = measure(engine, stmt)

        spark.conf.set("spark.sql.authz.enabled", "true")
        spark.conf.set("user.name", "bench_admin")
        # admin fast path: one store load + role closure, no per-table work
        engine2 = Engine(spark)
        spark.conf.set("spark.sql.authz.enabled", "false")
        engine2.sql("GRANT ROLE admin TO USER bench_admin")
        spark.conf.set("spark.sql.authz.enabled", "true")
        admin = measure(engine2, stmt)

        # full path: non-admin with a table grant → ref scan + resolve +
        # privilege intersection per statement
        spark.conf.set("spark.sql.authz.enabled", "false")
        engine2.sql("GRANT SELECT ON authz_bench_t TO USER bench_reader")
        spark.conf.set("user.name", "bench_reader")
        spark.conf.set("spark.sql.authz.enabled", "true")
        granted = measure(engine2, stmt)

        print(f"enforcement OFF  per statement: {off * 1e3:8.2f} ms")
        print(f"admin bypass     per statement: {admin * 1e3:8.2f} ms "
              f"(+{(admin - off) * 1e3:.2f})")
        print(f"granted non-admin per statement: {granted * 1e3:8.2f} ms "
              f"(+{(granted - off) * 1e3:.2f})")
    finally:
        spark.conf.unset("spark.sql.authz.enabled")
        try:
            spark.conf.unset("user.name")
        except Exception:  # noqa: BLE001
            pass
        spark.sql("DROP TABLE IF EXISTS authz_bench_t")


if __name__ == "__main__":
    main()
