"""CLI entry point — reference parity for CliDriver (SURVEY §3.1:
cli/CliDriver.java processLine → Driver.run). One-shot ``-e`` /
``-f`` execution and an interactive REPL over Engine.sql.

Usage:
    python -m amplab_hive_spark.cli -e "SELECT ..." [--sf-dir DIR]
    python -m amplab_hive_spark.cli -f script.sql [--sf-dir DIR]
    python -m amplab_hive_spark.cli            # REPL
    python -m amplab_hive_spark.cli --serve [--port N]   # SQL service
"""

from __future__ import annotations

import argparse
import sys


def _run_statements(engine, text: str, max_rows: int) -> None:
    # quote- and comment-aware split (shared with the golden harness)
    # — a ';' inside a string literal or a -- comment is not a
    # statement boundary.
    from amplab_hive_spark.testing_golden import split_statements

    for stmt in split_statements(text):
        df = engine.sql(stmt)
        df.show(max_rows, truncate=False)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="amplab-hive-spark")
    ap.add_argument("-e", metavar="SQL", help="run a SQL string and exit")
    ap.add_argument("-f", metavar="FILE", help="run a SQL script file and exit")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="testdata dir to attach")
    ap.add_argument("--max-rows", type=int, default=100)
    ap.add_argument(
        "--serve", action="store_true",
        help="run the multi-client SQL service (HiveServer2 analogue) "
             "until interrupted",
    )
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=10000)
    args = ap.parse_args(argv)

    if args.serve:
        if args.e is not None or args.f is not None:
            ap.error("--serve cannot be combined with -e/-f (the statement "
                     "would silently never run)")
        from amplab_hive_spark.service import SqlService
        from amplab_hive_spark.session import get_spark

        svc = SqlService(
            get_spark("sql-service"), host=args.host, port=args.port,
            sf_dir=args.sf_dir, max_rows=args.max_rows,
        )
        port = svc.start()
        print(f"SQL service listening on {args.host}:{port}", flush=True)
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            pass
        finally:
            svc.stop()
        return 0

    from amplab_hive_spark.engine import Engine

    engine = Engine(sf_dir=args.sf_dir)
    # `is not None`: an explicitly-passed empty string (-e "$UNSET")
    # must be a no-op one-shot run, not a silent fall-through into a
    # REPL that blocks the calling pipeline on stdin.
    if args.e is not None:
        _run_statements(engine, args.e, args.max_rows)
        return 0
    if args.f is not None:
        with open(args.f) as fh:
            _run_statements(engine, fh.read(), args.max_rows)
        return 0
    # REPL (CliDriver.processLine equivalent). Statements complete at
    # an UNQUOTED ';' — the buffer keeps accumulating across lines
    # while a string literal (or the statement itself) is still open,
    # so a multi-line literal containing ';' does not flush early.
    from amplab_hive_spark.testing_golden import split_statements

    print("amplab-hive-spark CLI — ';'-terminated statements, 'quit;' to exit")
    buf = ""
    for line in sys.stdin:
        buf += line
        # marker trick: append \x00 and split — if the buffer ends at
        # an unquoted ';', the marker comes back as its own final
        # segment; otherwise it rides at the end of the open tail
        # (unterminated statement or still-open string literal), which
        # stays buffered for the next line.
        segs = split_statements(buf + "\x00")
        if segs and segs[-1] != "\x00":
            buf = segs[-1][:-1] if segs[-1].endswith("\x00") else segs[-1]
            complete = segs[:-1]
        else:
            buf = ""
            complete = segs[:-1] if segs else []
        done = False
        for stmt in complete:
            if stmt.strip().lower() in ("quit", "exit"):
                done = True
                break
            try:
                _run_statements(engine, stmt, args.max_rows)
            except Exception as exc:  # surface analyzer errors, keep REPL alive
                print(f"ERROR: {exc}", file=sys.stderr)
        if done:
            break
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
