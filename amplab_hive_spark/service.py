"""Minimal multi-client SQL service — the HiveServer2 analogue.

The reference's last §3.1 entry point is a network service: Thrift
HiveServer2 wraps a Driver per statement per connection
(service/src/java/org/apache/hive/service/cli/operation/
SQLOperation.java:71), with one HiveConf/session per connection.
This module is the same session model over a deliberately small
wire format: a threaded TCP server speaking newline-delimited JSON,
one ``spark.newSession()`` + Engine per CONNECTION — so each client
gets its own temp-view namespace, SQLConf, and macro registry
(exactly the isolation tests/test_concurrent_engine.py pins), while
sharing the catalog and executors. Statements route through
``Engine.sql``, so the macro shim and the UPDATE/DELETE/MERGE
statement front-end (dml_text) work over the wire too.

Wire protocol (one JSON object per line, UTF-8):

    -> {"sql": "SELECT ..."}
    <- {"ok": true, "columns": [...], "rows": [[...]],
        "row_count": N, "truncated": false}
    <- {"ok": false, "error": "...", "error_class": "ValueError"}

Results are value-rendered for JSON (Decimal/date/timestamp →
strings, bytes → base64) and capped at ``max_rows`` per statement
(the HS2 fetch-size analogue — ``truncated: true`` says the cap
fired; a service is a control-plane surface, not a bulk-export
path). Errors are per-statement: the connection survives them.

Scope honestly stated: no authentication/TLS (binds 127.0.0.1 by
default — same trust model as an unsecured dev HiveServer2), no
cursors/pagination, no cancellation. It completes the entry-point
surface; capability-wise everything still lives in the engine.
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import socket
import socketserver
import threading
from typing import Any, Optional


def _json_safe(v: Any) -> Any:
    if isinstance(v, (decimal.Decimal,)):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date, datetime.timedelta)):
        # timedelta: DayTimeIntervalType results arrive as timedelta —
        # rendered like the other temporal types, as a string
        return str(v) if isinstance(v, datetime.timedelta) else v.isoformat()
    if isinstance(v, float):
        # json.dumps would emit bare NaN/Infinity — INVALID JSON for a
        # strict client (jq/JS/Go); render non-finite floats as strings
        if v != v or v in (float("inf"), float("-inf")):
            return str(v)
        return v
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _json_safe(x) for k, x in v.items()}
    if hasattr(v, "asDict"):  # nested Row
        return _json_safe(v.asDict())
    return v


class SqlService:
    """Threaded TCP SQL service over one SparkSession.

    ``start()`` binds and returns the port (port=0 → ephemeral);
    ``stop()`` shuts the listener down and closes live connections.
    Usable as a context manager."""

    def __init__(
        self,
        spark,
        host: str = "127.0.0.1",
        port: int = 0,
        sf_dir: Optional[str] = None,
        max_rows: int = 10_000,
    ):
        self._spark = spark
        self._host, self._port = host, port
        self._sf_dir = sf_dir
        self._max_rows = max_rows
        self._server: Optional[socketserver.ThreadingTCPServer] = None
        self._thread: Optional[threading.Thread] = None
        self._conns: set = set()
        self._conns_lock = threading.Lock()

    # -- server ------------------------------------------------------
    def start(self) -> int:
        svc = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                # one newSession + Engine per CONNECTION: the
                # HiveServer2 per-connection HiveConf/session model
                from amplab_hive_spark.engine import Engine

                with svc._conns_lock:
                    svc._conns.add(self.connection)
                try:
                    eng = Engine(
                        spark=svc._spark.newSession(), sf_dir=svc._sf_dir
                    )
                    for raw in self.rfile:
                        line = raw.strip()
                        if not line:
                            continue
                        # Serialization happens INSIDE the try: a row
                        # value json.dumps can't encode must become a
                        # per-statement error response, never a dead
                        # connection (the module contract).
                        try:
                            req = json.loads(line)
                            sql = req["sql"]
                            df = eng.sql(sql)
                            rows = df.take(svc._max_rows + 1)
                            truncated = len(rows) > svc._max_rows
                            rows = rows[: svc._max_rows]
                            payload = (
                                json.dumps(
                                    {
                                        "ok": True,
                                        "columns": df.columns,
                                        "rows": [
                                            [_json_safe(v) for v in r]
                                            for r in rows
                                        ],
                                        "row_count": len(rows),
                                        "truncated": truncated,
                                    },
                                    allow_nan=False,
                                )
                                + "\n"
                            )
                        except Exception as e:  # per-statement error —
                            # the connection survives, like HS2's
                            # per-operation error state
                            payload = (
                                json.dumps(
                                    {
                                        "ok": False,
                                        "error": str(e)[:2000],
                                        "error_class": type(e).__name__,
                                    }
                                )
                                + "\n"
                            )
                        self.wfile.write(payload.encode("utf-8"))
                        self.wfile.flush()
                finally:
                    with svc._conns_lock:
                        svc._conns.discard(self.connection)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((self._host, self._port), Handler)
        self._port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="sql-service", daemon=True
        )
        self._thread.start()
        return self._port

    @property
    def port(self) -> int:
        return self._port

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        # shutdown()/server_close() stop only the LISTENER; established
        # connections would keep executing SQL forever. Close them too
        # (their handler threads wake with EOF/error and exit).
        with self._conns_lock:
            conns, self._conns = set(self._conns), set()
        for c in conns:
            try:
                c.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                c.close()
            except OSError:
                pass
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    def __enter__(self) -> "SqlService":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()


# -- client (stdlib-only: usable from a process with no Spark) -------
class SqlClient:
    """One connection = one service session (own temp views/macros).
    ``sql()`` sends a statement and returns the decoded response
    dict; ``Exception`` is NOT raised on statement errors — callers
    check ``resp['ok']`` (the error is data, like a JDBC SQLException
    payload)."""

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._rfile = self._sock.makefile("rb")

    def sql(self, text: str) -> dict:
        self._sock.sendall((json.dumps({"sql": text}) + "\n").encode("utf-8"))
        line = self._rfile.readline()
        if not line:
            raise ConnectionError("service closed the connection")
        return json.loads(line)

    def close(self) -> None:
        try:
            self._rfile.close()
        finally:
            self._sock.close()

    def __enter__(self) -> "SqlClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
