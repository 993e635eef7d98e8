"""The network multi-client SQL service (SURVEY §3.1 entry point 2 —
the HiveServer2 analogue, reference service/.../SQLOperation.java:71).

The load-bearing test spawns the server over the session and TWO
concurrent CLIENT PROCESSES that speak only the stdlib wire protocol
(no Spark import client-side — service.py is loaded by file path to
bypass the package's pyspark imports): each runs a full DML round
trip (CREATE TABLE / INSERT / UPDATE / MERGE statements through the
dml_text front-end) on its own table, and both use the SAME temp-view
name concurrently to prove per-connection newSession isolation over
the wire."""

import json
import subprocess
import sys

import pytest

from amplab_hive_spark.service import SqlClient, SqlService

CLIENT_SCRIPT = r"""
import importlib.util, json, sys

spec = importlib.util.spec_from_file_location(
    "svc_client", "{service_py}"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
assert "pyspark" not in sys.modules, "client must not need Spark"

port, cid, wh = int(sys.argv[1]), sys.argv[2], sys.argv[3]
out = {{}}
with mod.SqlClient("127.0.0.1", port) as c:
    def ok(sql):
        r = c.sql(sql)
        assert r["ok"], f"{{sql!r}} failed: {{r}}"
        return r

    # per-connection temp-view isolation: every client uses the SAME
    # view name with a DIFFERENT body
    ok(f"CREATE OR REPLACE TEMPORARY VIEW svc_scratch AS "
       f"SELECT {{cid}} AS marker, n_nationkey FROM nation "
       f"WHERE n_regionkey = {{cid}}")
    r = ok("SELECT DISTINCT marker FROM svc_scratch")
    out["marker"] = r["rows"][0][0]

    # DML round trip on this client's own table, all as SQL text
    t = f"svc_dml_{{cid}}"
    ok(f"DROP TABLE IF EXISTS {{t}}")
    ok(f"CREATE TABLE {{t}} (id INT, val INT) USING parquet "
       f"LOCATION '{{wh}}/{{t}}'")
    ok(f"INSERT INTO {{t}} VALUES (1, 10), (2, 20), (3, 30)")
    r = ok(f"UPDATE {{t}} SET val = val + 1 WHERE id >= 2")
    out["updated"] = r["rows"][0][0]
    r = ok(f"MERGE INTO {{t}} USING (SELECT 3 AS id, 0 AS val) s "
           f"ON {{t}}.id = s.id "
           f"WHEN MATCHED AND s.val = 0 THEN DELETE "
           f"WHEN NOT MATCHED THEN INSERT (id, val) VALUES (s.id, s.val)")
    out["merge"] = r["rows"][0]
    r = ok(f"SELECT id, val FROM {{t}} ORDER BY id")
    out["rows"] = r["rows"]
    ok(f"DROP TABLE IF EXISTS {{t}}")

print(json.dumps(out))
"""


def test_two_concurrent_client_processes(spark, sf_dir, tmp_path):
    import amplab_hive_spark.service as service_mod

    svc = SqlService(spark, sf_dir=sf_dir)
    port = svc.start()
    script = tmp_path / "client.py"
    script.write_text(CLIENT_SCRIPT.format(service_py=service_mod.__file__))
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(port), cid, str(tmp_path)],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
            for cid in ("1", "2")
        ]
        outs = []
        for p in procs:
            stdout, stderr = p.communicate(timeout=300)
            assert p.returncode == 0, f"client failed:\n{stderr[-3000:]}"
            outs.append(json.loads(stdout.strip().splitlines()[-1]))
        for cid, out in zip((1, 2), outs):
            assert out["marker"] == cid, (
                "temp view leaked across connections"
            )
            assert out["updated"] == 2
            assert out["merge"] == [0, 1, 0]  # updated, deleted, inserted
            assert out["rows"] == [[1, 10], [2, 21]]
    finally:
        svc.stop()


def test_statement_error_keeps_connection(spark, sf_dir):
    with SqlService(spark, sf_dir=sf_dir) as svc:
        with SqlClient("127.0.0.1", svc.port) as c:
            bad = c.sql("SELECT * FROM definitely_missing_table_xyz")
            assert not bad["ok"]
            assert bad["error_class"]
            good = c.sql("SELECT 1 AS one")
            assert good["ok"] and good["rows"] == [[1]]


def test_value_rendering_and_truncation(spark, sf_dir):
    with SqlService(spark, sf_dir=sf_dir, max_rows=5) as svc:
        with SqlClient("127.0.0.1", svc.port) as c:
            r = c.sql(
                "SELECT CAST(1.50 AS DECIMAL(10,2)) AS d, "
                "DATE'2024-06-01' AS dt, "
                "TIMESTAMP'2024-06-01 12:00:00' AS ts, "
                "CAST('ab' AS BINARY) AS b"
            )
            assert r["ok"]
            assert r["rows"][0][0] == "1.50"
            assert r["rows"][0][1] == "2024-06-01"
            assert r["rows"][0][2].startswith("2024-06-01T12:00:00")
            assert r["rows"][0][3] == "YWI="  # base64('ab')
            big = c.sql("SELECT id FROM range(100)")
            assert big["ok"] and big["row_count"] == 5 and big["truncated"]


def test_macro_statements_over_the_wire(spark, sf_dir):
    """Engine.sql's macro shim must work per connection: each client
    defines the same macro name with different bodies."""
    with SqlService(spark, sf_dir=sf_dir) as svc:
        c1 = SqlClient("127.0.0.1", svc.port)
        c2 = SqlClient("127.0.0.1", svc.port)
        try:
            assert c1.sql("CREATE TEMPORARY MACRO bump(x INT) x + 100")["ok"]
            assert c2.sql("CREATE TEMPORARY MACRO bump(x INT) x + 200")["ok"]
            r1 = c1.sql("SELECT bump(1) AS v")
            r2 = c2.sql("SELECT bump(1) AS v")
            assert r1["rows"] == [[101]] and r2["rows"] == [[201]]
        finally:
            c1.close()
            c2.close()


# --- round-7 review-pass regressions --------------------------------
def test_interval_and_nan_results_keep_connection(spark, sf_dir):
    """A DayTimeIntervalType (timedelta) or NaN result must come back
    as a valid per-statement JSON response — serialization failures
    must never kill the connection (review finding: dumps ran outside
    the try)."""
    with SqlService(spark, sf_dir=sf_dir) as svc:
        with SqlClient("127.0.0.1", svc.port) as c:
            r = c.sql(
                "SELECT timestamp'2024-01-02 00:00:00' - "
                "timestamp'2024-01-01 00:00:00' AS iv"
            )
            assert r["ok"], r
            assert "1 day" in r["rows"][0][0]
            r2 = c.sql("SELECT CAST('NaN' AS DOUBLE) AS x, "
                       "CAST('Infinity' AS DOUBLE) AS y")
            assert r2["ok"], r2
            assert r2["rows"][0] == ["nan", "inf"]
            # connection still alive
            assert c.sql("SELECT 1 AS one")["rows"] == [[1]]


def test_stop_closes_live_connections(spark, sf_dir):
    """stop() must terminate ESTABLISHED connections, not just the
    listener (review finding: clients could keep executing SQL after
    stop())."""
    svc = SqlService(spark, sf_dir=sf_dir)
    port = svc.start()
    c = SqlClient("127.0.0.1", port)
    assert c.sql("SELECT 1 AS one")["ok"]
    svc.stop()
    with pytest.raises((ConnectionError, OSError)):
        c.sql("SELECT 2 AS two")
    c.close()


def test_serve_flag_rejects_one_shot_statements(tmp_path):
    """--serve with -e must error loudly, not silently drop the
    statement (review finding)."""
    import subprocess
    import sys as _sys

    p = subprocess.run(
        [_sys.executable, "-m", "amplab_hive_spark.cli", "--serve",
         "-e", "SELECT 1"],
        capture_output=True, text=True, timeout=120,
    )
    assert p.returncode != 0
    assert "--serve cannot be combined" in p.stderr


# r8: operation handles — cancellation + FETCH_NEXT pagination
# (CLIService.cancelOperation / OperationHandle analogues) and the
# ADVICE fix: session-init failures reported in-band.


def test_fetch_pages_wide_result_to_completion(spark, sf_dir):
    with SqlService(spark, sf_dir=sf_dir, max_rows=7) as svc:
        with SqlClient("127.0.0.1", svc.port) as c:
            r = c.sql("SELECT id FROM range(25) ORDER BY id")
            assert r["ok"] and r["truncated"] and r["has_more"]
            assert r["row_count"] == 7 and "handle" in r
            got = [row[0] for row in r["rows"]]
            h = r["handle"]
            while r["has_more"]:
                r = c.fetch(h)
                assert r["ok"]
                got.extend(row[0] for row in r["rows"])
            assert got == list(range(25))
            # exhausted cursor is gone
            dead = c.fetch(h)
            assert not dead["ok"] and dead["error_class"] == "KeyError"


def test_sql_all_convenience_pages_everything(spark, sf_dir):
    with SqlService(spark, sf_dir=sf_dir, max_rows=4) as svc:
        with SqlClient("127.0.0.1", svc.port) as c:
            r = c.sql_all("SELECT id FROM range(11) ORDER BY id")
            assert r["ok"] and not r["has_more"]
            assert [row[0] for row in r["rows"]] == list(range(11))
            assert r["row_count"] == 11


def test_close_cursor_frees_handle(spark, sf_dir):
    with SqlService(spark, sf_dir=sf_dir, max_rows=3) as svc:
        with SqlClient("127.0.0.1", svc.port) as c:
            r = c.sql("SELECT id FROM range(10)")
            assert r["has_more"]
            out = c.close_cursor(r["handle"])
            assert out["ok"] and out["existed"]
            dead = c.fetch(r["handle"])
            assert not dead["ok"]


def test_cancel_long_statement_connection_survives(spark, sf_dir):
    """A second connection cancels a statement mid-flight by id; the
    first connection gets a per-statement error and keeps working —
    HS2's CANCELED operation state, via Spark job groups."""
    import threading as _th
    import time as _time

    with SqlService(spark, sf_dir=sf_dir) as svc:
        with SqlClient("127.0.0.1", svc.port, timeout=300) as c1, \
                SqlClient("127.0.0.1", svc.port) as c2:
            result: dict = {}

            def run_slow():
                # ~10^10 cross-join rows: minutes of work if not cancelled
                result["resp"] = c1.sql(
                    "SELECT count(*) FROM range(100000) a "
                    "CROSS JOIN range(100000) b "
                    "WHERE a.id * b.id = 999999999999",
                    stmt_id="slow-one",
                )

            t = _th.Thread(target=run_slow)
            t.start()
            deadline = _time.time() + 30
            cancelled = None
            while _time.time() < deadline:
                cancelled = c2.cancel("slow-one")
                if cancelled["was_running"]:
                    break
                _time.sleep(0.2)
            assert cancelled and cancelled["was_running"], \
                "statement never observed running"
            t.join(timeout=120)
            assert not t.is_alive(), "cancel did not interrupt the statement"
            resp = result["resp"]
            assert not resp["ok"] and "cancel" in resp["error"].lower()
            # the connection survives the cancelled statement
            again = c1.sql("SELECT 42 AS v")
            assert again["ok"] and again["rows"] == [[42]]


def test_cancel_unknown_id_is_safe(spark, sf_dir):
    with SqlService(spark, sf_dir=sf_dir) as svc:
        with SqlClient("127.0.0.1", svc.port) as c:
            r = c.cancel("never-ran")
            assert r["ok"] and not r["was_running"]


def test_engine_init_failure_reported_in_band(spark, sf_dir, monkeypatch):
    """ADVICE r7: Engine construction failure must produce one
    ok:false line, not a bare connection drop."""
    import amplab_hive_spark.engine as engine_mod

    class Boom:
        def __init__(self, *a, **k):
            raise RuntimeError("forced init failure for test")

    monkeypatch.setattr(engine_mod, "Engine", Boom)
    with SqlService(spark, sf_dir=sf_dir) as svc:
        with SqlClient("127.0.0.1", svc.port) as c:
            r = c.sql("SELECT 1")
            assert not r["ok"]
            assert "session initialization failed" in r["error"]
            assert r["error_class"] == "RuntimeError"


def test_retry_after_cancel_same_id_not_poisoned(spark, sf_dir):
    """Review r8: cancelJobGroupAndFutureJobs poisons a job-group id
    forever, so the group must carry a per-execution uuid — retrying
    a statement with the SAME client id after a cancel must succeed."""
    with SqlService(spark, sf_dir=sf_dir) as svc:
        with SqlClient("127.0.0.1", svc.port) as c:
            r1 = c.sql("SELECT 1 AS v", stmt_id="retry-me")
            assert r1["ok"]
            # cancel by that id (nothing running: was_running false,
            # but a naive fixed group name would now be poisoned)
            svc._cancel("retry-me")
            # simulate the worst case: cancel fired while registered
            import uuid as _uuid
            g = f"sqlsvc-retry-me-{_uuid.uuid4().hex[:8]}"
            spark.sparkContext._jsc.sc().cancelJobGroupAndFutureJobs(g)
            r2 = c.sql("SELECT count(*) AS n FROM range(1000)",
                       stmt_id="retry-me")
            assert r2["ok"] and r2["rows"] == [[1000]]


# r9: cursor hygiene (VERDICT r8 "What's wrong" #2) — idle eviction
# + LRU cap, the hive.server2.idle.operation.timeout analogue.


def test_idle_cursor_evicted_on_next_request(spark, sf_dir):
    import time

    with SqlService(spark, sf_dir=sf_dir, max_rows=3,
                    cursor_idle_s=2.5) as svc:
        with SqlClient("127.0.0.1", svc.port) as c:
            r = c.sql("SELECT id FROM range(10)")
            assert r["has_more"]
            h = r["handle"]
            time.sleep(3.0)
            # any request sweeps the abandoned cursor...
            assert c.sql("SELECT 1 AS one")["ok"]
            # ...so the stale handle is gone
            dead = c.fetch(h)
            assert not dead["ok"] and dead["error_class"] == "KeyError"
            # a FRESH cursor paged promptly is untouched by the sweep
            r2 = c.sql("SELECT id FROM range(9) ORDER BY id")
            got = [row[0] for row in r2["rows"]]
            while r2["has_more"]:
                r2 = c.fetch(r2["handle"])
                got.extend(row[0] for row in r2["rows"])
            assert got == list(range(9))


def test_cursor_spam_bounded_active_cursors_protected(spark, sf_dir,
                                                      monkeypatch):
    """Review r9: at the cap, a RECENTLY-touched LRU cursor must not
    be yanked mid-pagination — the new statement gets the explicit
    too-many-cursors error and every existing handle keeps working;
    once the grace window passes (forced to 0 here), the LRU handle
    is evicted and the new statement succeeds."""
    from amplab_hive_spark import service as svc_mod

    with SqlService(spark, sf_dir=sf_dir, max_rows=2) as svc:
        with SqlClient("127.0.0.1", svc.port) as c:
            handles = []
            for i in range(svc_mod._MAX_CURSORS):
                r = c.sql(f"SELECT id FROM range({100 + i}) ORDER BY id")
                assert r["ok"] and r["has_more"], f"statement {i} must succeed"
                handles.append(r["handle"])
            # cap reached, all cursors freshly touched: explicit error
            over = c.sql("SELECT id FROM range(200) ORDER BY id")
            assert not over["ok"] and "too many open cursors" in over["error"]
            # the oldest handle is still alive and pages correctly
            r = c.fetch(handles[0])
            assert r["ok"] and [row[0] for row in r["rows"]] == [2, 3]
            # grace elapsed (forced): LRU evicted, new statement works
            monkeypatch.setattr(svc_mod, "_LRU_EVICT_GRACE_S", 0.0)
            r2 = c.sql("SELECT id FROM range(201) ORDER BY id")
            assert r2["ok"] and r2["has_more"]
            dead = c.fetch(handles[1])  # handles[0] was re-touched above
            assert not dead["ok"] and dead["error_class"] == "KeyError"


def test_server_confs_seed_each_connection(spark, sf_dir):
    """review r13: cli --serve --hiveconf was a silent no-op — runtime
    conf.set on the ROOT session never propagates into the
    per-connection newSession() SQLConfs. server_confs seeds each
    connection's session explicitly (same plumbing tcli grew)."""
    with SqlService(spark, sf_dir=sf_dir,
                    server_confs={"ahs.served.conf": "on"}) as svc:
        with SqlClient("127.0.0.1", svc.port) as c:
            r = c.sql("SET ahs.served.conf")
            assert r["ok"], r
            assert r["rows"] == [["ahs.served.conf", "on"]]
