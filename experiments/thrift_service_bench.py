"""Protocol overhead: the HS2-compatible Thrift/JDBC path
(thrift.py via the bundled beeline) vs the newline-JSON SQL service
(service.py via SqlClient), same SparkSession underneath.

What this answers: what a migrating user pays for standard-protocol
compatibility. Beeline is a JVM process, so its per-INVOCATION cost
is dominated by client startup — measured separately from the
amortized per-statement cost inside one session (N statements per
connection). The JSON client is stdlib-only and has no startup.

Run: ``python experiments/thrift_service_bench.py``.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amplab_hive_spark import thrift
from amplab_hive_spark.catalog import tables
from amplab_hive_spark.service import SqlClient, SqlService
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
N_STMTS = 12
STMT = "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"


def main() -> None:
    spark = get_spark("thrift-vs-service-bench")
    tables(spark, SF_DIR)

    # --- JSON service ------------------------------------------------
    svc = SqlService(spark, sf_dir=SF_DIR)
    port = svc.start()
    t0 = time.time()
    with SqlClient("127.0.0.1", port) as c:
        t_connect_json = time.time() - t0
        # warmup (first statement builds the connection's Engine)
        c.sql("SELECT 1 AS one")
        t0 = time.time()
        for _ in range(N_STMTS):
            r = c.sql(STMT)
            assert r["ok"] and r["row_count"] == 5
        json_per_stmt = (time.time() - t0) / N_STMTS
    svc.stop()

    # --- Thrift / beeline --------------------------------------------
    tport = thrift.free_port()
    thrift.start_thrift_server(spark, port=tport)
    import pyspark

    sh = os.path.dirname(pyspark.__file__)
    env = dict(os.environ, SPARK_HOME=sh)

    def beeline(args):
        t0 = time.time()
        p = subprocess.run(
            [thrift.beeline_path(), "-u", f"jdbc:hive2://localhost:{tport}",
             *args],
            capture_output=True, text=True, timeout=300, env=env)
        assert p.returncode == 0, p.stderr[-400:]
        return time.time() - t0

    # min-of-2 reps each: a single JVM launch varies by ~0.5s, which
    # would swamp the per-statement delta
    one = min(beeline(["-e", STMT]) for _ in range(2))
    big_n = N_STMTS * 2
    many = min(
        beeline([x for _ in range(big_n) for x in ("-e", STMT)])
        for _ in range(2)
    )
    thrift_per_stmt = max((many - one) / (big_n - 1), 0.0)

    print(json.dumps({
        "experiment": "thrift_vs_json_service",
        "n_stmts": N_STMTS, "thrift_session_stmts": N_STMTS * 2,
        "json_connect_s": round(t_connect_json, 4),
        "json_per_stmt_s": round(json_per_stmt, 4),
        "beeline_one_shot_s": round(one, 3),       # JVM startup dominated
        "beeline_session_s": round(many, 3),
        "thrift_per_stmt_s": round(thrift_per_stmt, 4),
        "sf_dir": SF_DIR,
    }))


if __name__ == "__main__":
    main()
