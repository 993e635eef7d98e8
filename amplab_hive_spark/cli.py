"""CLI entry point — reference parity for CliDriver (SURVEY §3.1:
cli/CliDriver.java processLine → Driver.run). One-shot ``-e`` /
``-f`` execution and an interactive REPL over Engine.sql.

Usage:
    python -m amplab_hive_spark.cli -e "SELECT ..." [--sf-dir DIR]
    python -m amplab_hive_spark.cli -f script.sql [--sf-dir DIR]
    python -m amplab_hive_spark.cli            # REPL
"""

from __future__ import annotations

import argparse
import sys


def _run_statements(engine, text: str, max_rows: int) -> None:
    for stmt in [s.strip() for s in text.split(";") if s.strip()]:
        df = engine.sql(stmt)
        df.show(max_rows, truncate=False)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="amplab-hive-spark")
    ap.add_argument("-e", metavar="SQL", help="run a SQL string and exit")
    ap.add_argument("-f", metavar="FILE", help="run a SQL script file and exit")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="testdata dir to attach")
    ap.add_argument("--max-rows", type=int, default=100)
    args = ap.parse_args(argv)

    from amplab_hive_spark.engine import Engine

    engine = Engine(sf_dir=args.sf_dir)
    if args.e:
        _run_statements(engine, args.e, args.max_rows)
        return 0
    if args.f:
        with open(args.f) as fh:
            _run_statements(engine, fh.read(), args.max_rows)
        return 0
    # REPL (CliDriver.processLine equivalent)
    print("amplab-hive-spark CLI — ';'-terminated statements, 'quit;' to exit")
    buf: list[str] = []
    for line in sys.stdin:
        buf.append(line)
        if ";" in line:
            text = "".join(buf)
            buf = []
            if text.strip().rstrip(";").lower() in ("quit", "exit"):
                break
            try:
                _run_statements(engine, text, args.max_rows)
            except Exception as exc:  # surface analyzer errors, keep REPL alive
                print(f"ERROR: {exc}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
