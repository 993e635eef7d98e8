"""Measure the SQL service's multi-client throughput — the entry
point the reference serves through HiveServer2 (service/.../
SQLOperation.java wraps a Driver per statement; Thrift adds its own
framing cost). This repo's analogue is a newline-JSON TCP server
with one newSession+Engine per connection; the question a deployer
asks is "what does the wire + per-connection session model cost per
statement, and does it scale with concurrent clients?"

Measures, at sf0.1 on the local service:

- single-client round-trip latency for a trivial statement
  (SELECT 1): the protocol + Engine.sql floor;
- single-client latency for a real scan-agg (pricing summary over
  lineitem): dominated by the query, not the wire;
- aggregate statements/sec with 1, 4, and 8 concurrent client
  THREADS each running its own connection (per-connection
  newSession isolation is exactly what lets these run without
  contending on temp-view state).

Run: ``python experiments/service_throughput_bench.py`` — one JSON
line.
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amplab_hive_spark.service import SqlClient, SqlService
from amplab_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TRIVIAL = "SELECT 1 AS one"
SCAN_AGG = (
    "SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS q "
    "FROM lineitem GROUP BY l_returnflag"
)


def latency(port: int, sql: str, n: int) -> float:
    with SqlClient("127.0.0.1", port) as c:
        c.sql(sql)  # warm the connection's session
        t0 = time.time()
        for _ in range(n):
            r = c.sql(sql)
            assert r["ok"], r
        return (time.time() - t0) / n


def throughput(port: int, sql: str, clients: int, per_client: int) -> float:
    def worker(_i: int) -> int:
        with SqlClient("127.0.0.1", port) as c:
            c.sql(sql)
            for _ in range(per_client):
                assert c.sql(sql)["ok"]
        return per_client

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=clients) as ex:
        total = sum(ex.map(worker, range(clients)))
    return total / (time.time() - t0)


def main() -> None:
    spark = get_spark("service-throughput-bench")
    svc = SqlService(spark, sf_dir=SF_DIR)
    port = svc.start()
    try:
        out = {
            "experiment": "service_throughput",
            "sf_dir": SF_DIR,
            "trivial_latency_ms": round(latency(port, TRIVIAL, 30) * 1000, 2),
            "scan_agg_latency_ms": round(latency(port, SCAN_AGG, 10) * 1000, 2),
            "trivial_stmts_per_sec": {
                str(c): round(throughput(port, TRIVIAL, c, 25), 1)
                for c in (1, 4, 8)
            },
            "scan_agg_stmts_per_sec": {
                str(c): round(throughput(port, SCAN_AGG, c, 8), 1)
                for c in (1, 4, 8)
            },
        }
        print(json.dumps(out))
    finally:
        svc.stop()


if __name__ == "__main__":
    main()
