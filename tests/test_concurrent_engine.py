"""Concurrent multi-client smoke — the HiveServer2 semantics story
(SURVEY §3.1 entry point 2; reference: service/.../SQLOperation.java
wraps a Driver per statement, one HiveConf per connection).

Spark's analogue: one JVM/SparkContext, ``spark.newSession()`` per
client connection — isolated temp-view namespace and SQLConf, shared
catalog data and executors. Each Engine carries its own macro
registry. These tests pin (a) result correctness under concurrent
statement execution on one engine, and (b) per-connection isolation
of same-named temp views and macros across engines.
"""

from concurrent.futures import ThreadPoolExecutor

from amplab_hive_spark.engine import Engine


def test_concurrent_statements_one_engine(spark, sf_dir):
    """Many clients hammering ONE engine concurrently: every
    statement runs and returns the right answer (Spark sessions are
    thread-safe; the reference serializes compilation per Driver —
    here Catalyst analysis is concurrent)."""
    eng = Engine(spark=spark, sf_dir=sf_dir)

    def client(i: int) -> tuple[int, int]:
        df = eng.sql(
            f"SELECT count(*) AS n FROM orders WHERE o_custkey % 10 = {i % 10}"
        )
        expected = eng.table("orders").filter(f"o_custkey % 10 = {i % 10}").count()
        return df.collect()[0]["n"], expected

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(client, range(16)))
    assert all(got == want for got, want in results), results


def test_per_connection_isolation(spark, sf_dir):
    """Each 'connection' (newSession + Engine) sees its OWN temp view
    and macro under the same name — the per-session HiveConf/registry
    isolation HiveServer2 provides."""

    def connection(i: int) -> tuple[int, float]:
        sess = spark.newSession()
        eng = Engine(spark=sess, sf_dir=sf_dir)
        eng.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW conn_scratch AS "
            f"SELECT * FROM nation WHERE n_regionkey = {i % 5}"
        )
        eng.sql(f"CREATE TEMPORARY MACRO bump(x INT) x + {i}")
        rows = eng.sql(
            "SELECT count(*) AS n, max(bump(n_nationkey)) AS m FROM conn_scratch"
        ).collect()[0]
        return rows["n"], rows["m"]

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(connection, range(4)))

    # Every connection got ITS view (region i) and ITS macro (+i):
    # max(n_nationkey + i) differs per i even where counts collide.
    base = {
        i: (
            spark.table("nation").filter(f"n_regionkey = {i}").count(),
            spark.table("nation")
            .filter(f"n_regionkey = {i}")
            .agg({"n_nationkey": "max"})
            .collect()[0][0],
        )
        for i in range(4)
    }
    for i, (n, m) in enumerate(results):
        assert n == base[i][0], (i, n, base[i])
        assert m == base[i][1] + i, (i, m, base[i])

    # The parent session never saw any connection's temp view.
    assert "conn_scratch" not in [t.name for t in spark.catalog.listTables()]
