"""SQL-text front-end for UPDATE / DELETE / MERGE statements.

The reference accepts row-level DML as STATEMENTS —
``ql/parse/UpdateDeleteSemanticAnalyzer.java:76`` rewrites
``UPDATE t SET ... WHERE ...`` and ``DELETE FROM t WHERE ...`` into
``INSERT ... SELECT`` over the same table (and Hive 2.2's
MergeSemanticAnalyzer does the same for MERGE). This repo implements
the identical semantics as Python verbs (ddl.update_table /
delete_from / merge_into — partition-scoped copy-on-write); this
module closes the remaining STATEMENT-surface gap: a light
recognizer that routes the three DML statement forms to those verbs,
so ``Engine.sql("UPDATE ...")`` works the way a reference user
expects. Everything after recognition — discovery scans, partition
scoping, cardinality checks, crash-window semantics — is exactly the
documented verb behavior; this file contains no execution logic.

Grammar accepted (documented constraints, mirrored in tests):

- ``UPDATE <table> SET col = expr[, ...] [WHERE <cond>]``
- ``DELETE FROM <table> [WHERE <cond>]``
- ``MERGE INTO <table> [AS] [<talias>] USING (<subquery>)|<table>
  [AS] [<salias>] ON <cond>
  [WHEN MATCHED [AND <cond>] THEN DELETE]
  [WHEN MATCHED THEN UPDATE SET col = expr[, ...]]
  [WHEN NOT MATCHED THEN INSERT [(cols)] VALUES (exprs) | INSERT *]``

Aliases in MERGE expressions are normalized to the ``t.``/``s.``
convention merge_into uses; statements that do not start with one of
the three keywords pass through untouched (handle() returns None).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` at paren depth 0 outside single-quoted
    literals — the same care Hive's parser takes with SET lists."""
    parts, depth, quote, start = [], 0, False, 0
    i = 0
    while i < len(s):
        ch = s[i]
        if quote:
            if ch == "'":
                quote = False
        elif ch == "'":
            quote = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return parts


def _assignments(text: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for piece in _split_top(text, ","):
        col, eq, expr = piece.partition("=")
        if not eq or not col.strip():
            raise ValueError(f"malformed SET assignment: {piece.strip()!r}")
        out[col.strip()] = expr.strip()
    return out


def _rewrite_alias(expr: str, alias: str | None, canonical: str) -> str:
    if not alias or alias.lower() == canonical:
        return expr
    return re.sub(rf"\b{re.escape(alias)}\s*\.", f"{canonical}.", expr, flags=re.I)


_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+([\w.]+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*?))?\s*;?\s*$",
    re.I | re.S,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*?))?\s*;?\s*$", re.I | re.S
)
_MERGE_HEAD_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?"
    r"\s+USING\s+(\((?:[^()]|\([^()]*\))*\)|[\w.]+)(?:\s+(?:AS\s+)?(\w+))?"
    r"\s+ON\s+(.+)$",
    re.I | re.S,
)
_WHEN_SPLIT_RE = re.compile(r"\bWHEN\s+(?=(?:NOT\s+)?MATCHED\b)", re.I)
_MATCHED_UPDATE_RE = re.compile(
    r"^MATCHED\s+THEN\s+UPDATE\s+SET\s+(.*)$", re.I | re.S
)
_MATCHED_DELETE_RE = re.compile(
    r"^MATCHED\s+(?:AND\s+(.*?)\s+)?THEN\s+DELETE\s*;?\s*$", re.I | re.S
)
_NOT_MATCHED_RE = re.compile(
    r"^NOT\s+MATCHED\s+THEN\s+INSERT\s*(\*|(?:\(([^)]*)\))?\s*VALUES\s*\((.*)\))\s*;?\s*$",
    re.I | re.S,
)


def handle(spark: SparkSession, text: str) -> DataFrame | None:
    """Route a DML statement to its ddl verb; None if ``text`` is not
    an UPDATE/DELETE/MERGE statement. Returns a one-row count frame
    (the rows-affected answer a CLI prints)."""
    from amplab_hive_spark.ddl import delete_from, merge_into, update_table

    m = _UPDATE_RE.match(text)
    if m:
        name, set_text, cond = m.group(1), m.group(2), m.group(3)
        n = update_table(spark, name, cond or "true", _assignments(set_text))
        return spark.createDataFrame([(n,)], "updated bigint")

    m = _DELETE_RE.match(text)
    if m:
        name, cond = m.group(1), m.group(2)
        n = delete_from(spark, name, cond or "true")
        return spark.createDataFrame([(n,)], "deleted bigint")

    if not re.match(r"^\s*MERGE\b", text, re.I):
        return None
    m = _MERGE_HEAD_RE.match(text)
    if not m:
        raise ValueError(
            "unsupported MERGE syntax — expected: MERGE INTO <table> [alias] "
            "USING <table|(subquery)> [alias] ON <cond> WHEN ..."
        )
    name, talias, src_text, salias, rest = m.groups()
    pieces = _WHEN_SPLIT_RE.split(rest)
    on = pieces[0].strip()
    if len(pieces) < 2:
        raise ValueError("MERGE requires at least one WHEN clause")

    src_text = src_text.strip()
    source = (
        spark.sql(src_text[1:-1]) if src_text.startswith("(") else spark.table(src_text)
    )

    def canon(expr: str) -> str:
        # explicit aliases first, then bare table names used as
        # qualifiers (Hive allows `MERGE INTO tbl ... ON tbl.id = ...`)
        expr = _rewrite_alias(_rewrite_alias(expr, talias, "t"), salias, "s")
        expr = _rewrite_alias(expr, name.split(".")[-1], "t")
        if not src_text.startswith("("):
            expr = _rewrite_alias(expr, src_text.split(".")[-1], "s")
        return expr

    matched_update = matched_delete = not_matched_insert = None
    for clause in pieces[1:]:
        clause = clause.strip()
        mu = _MATCHED_UPDATE_RE.match(clause)
        md = _MATCHED_DELETE_RE.match(clause)
        mi = _NOT_MATCHED_RE.match(clause)
        if mu:
            if matched_update is not None:
                raise ValueError("duplicate WHEN MATCHED ... UPDATE clause")
            matched_update = {
                c: canon(e) for c, e in _assignments(mu.group(1).rstrip("; \n")).items()
            }
        elif md:
            if matched_delete is not None:
                raise ValueError("duplicate WHEN MATCHED ... DELETE clause")
            matched_delete = canon(md.group(1)) if md.group(1) else "true"
        elif mi:
            if not_matched_insert is not None:
                raise ValueError("duplicate WHEN NOT MATCHED clause")
            if mi.group(1) == "*":
                tcols = [f.name for f in spark.table(name).schema.fields]
                scols = {c.lower() for c in source.columns}
                not_matched_insert = {
                    c: f"s.{c}" for c in tcols if c.lower() in scols
                }
            else:
                exprs = [e.strip() for e in _split_top(mi.group(3), ",")]
                if mi.group(2):
                    cols = [c.strip() for c in mi.group(2).split(",")]
                else:
                    cols = [f.name for f in spark.table(name).schema.fields]
                if len(cols) != len(exprs):
                    raise ValueError(
                        f"MERGE INSERT arity mismatch: {len(cols)} columns, "
                        f"{len(exprs)} values"
                    )
                not_matched_insert = {c: canon(e) for c, e in zip(cols, exprs)}
        else:
            raise ValueError(f"unsupported MERGE WHEN clause: WHEN {clause[:60]}")

    stats = merge_into(
        spark,
        name,
        source,
        on=canon(on),
        matched_update=matched_update,
        matched_delete=matched_delete,
        not_matched_insert=not_matched_insert,
    )
    return spark.createDataFrame(
        [(stats["updated"], stats["deleted"], stats["inserted"])],
        "updated bigint, deleted bigint, inserted bigint",
    )
