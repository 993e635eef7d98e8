"""CLI (cli.py — CliDriver parity): statement splitting must be
quote-aware, and one-shot flags must never fall through into the
stdin-blocking REPL."""

import io
import sys

from amplab_hive_spark.cli import main


def test_one_shot_e_with_semicolon_in_literal(spark, sf_dir, capsys):
    assert main(["-e", "SELECT ';' AS c; SELECT n_name FROM nation LIMIT 1",
                 "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert ";" in out and "n_name" in out


def test_empty_e_is_a_noop_not_a_repl(spark, sf_dir, monkeypatch):
    """-e "" (e.g. an unset shell variable) must exit 0 immediately;
    falling into the REPL would block on stdin forever. stdin is
    rigged to raise if anything reads it."""

    class _Boom:
        def __iter__(self):
            raise AssertionError("REPL read stdin on empty -e")

    monkeypatch.setattr(sys, "stdin", _Boom())
    assert main(["-e", "", "--sf-dir", sf_dir]) == 0


def test_repl_buffers_multiline_literal(spark, sf_dir, monkeypatch, capsys):
    """A ';' inside a string literal spanning lines must not flush
    the buffer early — the statement runs once the quote closes."""
    monkeypatch.setattr(
        sys, "stdin",
        io.StringIO("SELECT 'a;\nb' AS multi;\nSELECT 2 AS two;\nquit;\n"),
    )
    assert main(["--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "multi" in out and "two" in out
