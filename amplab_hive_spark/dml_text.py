"""SQL-text front-end for UPDATE / DELETE / MERGE statements.

The reference accepts row-level DML as STATEMENTS —
``ql/parse/UpdateDeleteSemanticAnalyzer.java:76`` rewrites
``UPDATE t SET ... WHERE ...`` and ``DELETE FROM t WHERE ...`` into
``INSERT ... SELECT`` over the same table (and Hive 2.2's
MergeSemanticAnalyzer does the same for MERGE). This repo implements
the identical semantics as Python verbs (ddl.update_table /
delete_from / merge_into — partition-scoped copy-on-write); this
module closes the remaining STATEMENT-surface gap: a recognizer that
routes the three DML statement forms to those verbs, so
``Engine.sql("UPDATE ...")`` works the way a reference user expects.
Everything after recognition — discovery scans, partition scoping,
cardinality checks, crash-window semantics — is exactly the
documented verb behavior; this file contains no execution logic.

Grammar accepted (documented constraints, mirrored in tests):

- ``UPDATE <table> SET col = expr[, ...] [WHERE <cond>]``
- ``DELETE FROM <table> [WHERE <cond>]``
- ``MERGE INTO <table> [AS] [<talias>] USING (<subquery>)|<table>
  [AS] [<salias>] ON <cond>
  [WHEN MATCHED AND <cond> THEN DELETE]
  [WHEN MATCHED THEN UPDATE SET col = expr[, ...]]
  [WHEN NOT MATCHED THEN INSERT [(cols)] VALUES (exprs) | INSERT *]``

All keyword boundaries (WHERE, ON..WHEN, the USING source) are found
by a quote- and paren-aware scanner, never by bare regex over the
whole text — string literals containing keywords, commas, or
``alias.`` prefixes pass through intact. Aliases in MERGE
expressions are normalized to the ``t.``/``s.`` convention
merge_into uses, OUTSIDE string literals only. When both MATCHED
clauses are present the DELETE must come first and carry AND —
merge_into evaluates delete-before-update, so that is the one
textual order whose ANSI first-matching-clause semantics the verb
reproduces exactly; other orders are rejected loudly rather than
silently reordered. Statements that do not start with one of the
three keywords pass through untouched (handle() returns None).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _scan(s: str):
    """Yield (index, char, in_quote, depth) with single-quote and
    backslash-escape awareness and paren depth tracking."""
    depth, quote, i = 0, False, 0
    while i < len(s):
        ch = s[i]
        if quote:
            if ch == "\\":
                yield i, ch, True, depth
                i += 2
                continue
            if ch == "'":
                quote = False
        elif ch == "'":
            quote = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        yield i, ch, quote, depth
        i += 1


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` at paren depth 0 outside string literals."""
    parts, start = [], 0
    for i, ch, quote, depth in _scan(s):
        if ch == sep and not quote and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def _find_keyword(s: str, word: str, start: int = 0) -> int:
    """Index of the first top-level (depth-0, unquoted) occurrence of
    ``word`` as a whole word; -1 if absent."""
    wl, n = word.lower(), len(word)
    for i, ch, quote, depth in _scan(s):
        if i < start or quote or depth != 0:
            continue
        if (
            s[i : i + n].lower() == wl
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (
                i + n >= len(s)
                or not (s[i + n].isalnum() or s[i + n] == "_")
            )
        ):
            return i
    return -1


def _split_where(body: str, stmt: str) -> tuple[str, str | None]:
    """Split ``body`` at its top-level WHERE. A present-but-empty
    condition is a syntax error, never TRUE — 'DELETE ... WHERE ;'
    must not silently become delete-everything."""
    body = body.rstrip().rstrip(";").rstrip()
    w = _find_keyword(body, "WHERE")
    if w < 0:
        return body, None
    cond = body[w + 5 :].strip()
    if not cond:
        raise ValueError(f"{stmt}: WHERE requires a condition")
    return body[:w].rstrip(), cond


def _assignments(text: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for piece in _split_top(text, ","):
        col, eq, expr = piece.partition("=")
        if not eq or not col.strip() or not expr.strip():
            raise ValueError(f"malformed SET assignment: {piece.strip()!r}")
        out[col.strip()] = expr.strip()
    return out


def _rewrite_alias(expr: str, alias: str | None, canonical: str) -> str:
    """Replace ``alias.`` qualifiers with ``canonical.`` OUTSIDE
    string literals — a literal 'see src.example.com' must survive."""
    if not alias or alias.lower() == canonical:
        return expr
    pat = re.compile(rf"\b{re.escape(alias)}\s*\.", re.I)
    # split into literal and non-literal segments; rewrite only the
    # non-literal ones (re.S so literals with newlines stay literals)
    segs = re.split(r"('(?:[^'\\]|\\.)*')", expr, flags=re.S)
    return "".join(
        seg if i % 2 else pat.sub(f"{canonical}.", seg)
        for i, seg in enumerate(segs)
    )


_UPDATE_HEAD = re.compile(r"^\s*UPDATE\s+([\w.]+)\s+SET\s+", re.I | re.S)
_DELETE_HEAD = re.compile(r"^\s*DELETE\s+FROM\s+([\w.]+)\s*", re.I | re.S)
_MERGE_INTO = re.compile(
    r"^\s*MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?\s+USING\s+",
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


def _parse_using_source(rest: str) -> tuple[str, str]:
    """rest starts at the USING operand: a table name or a
    parenthesized subquery (arbitrary nesting, quote-aware). Returns
    (source_text, remainder)."""
    rest = rest.lstrip()
    if rest.startswith("("):
        for i, ch, quote, depth in _scan(rest):
            if ch == ")" and not quote and depth == 0:
                return rest[: i + 1], rest[i + 1 :]
        raise ValueError("unsupported MERGE syntax — unbalanced ( in USING")
    m = re.match(r"[\w.]+", rest)
    if not m:
        raise ValueError("unsupported MERGE syntax — expected USING <table|(subquery)>")
    return m.group(0), rest[m.end() :]


def handle(spark: SparkSession, text: str) -> DataFrame | None:
    """Route a DML statement to its ddl verb; None if ``text`` is not
    an UPDATE/DELETE/MERGE statement. Returns a one-row count frame
    (the rows-affected answer a CLI prints)."""
    from amplab_hive_spark.ddl import delete_from, merge_into, update_table

    m = _UPDATE_HEAD.match(text)
    if m:
        set_text, cond = _split_where(text[m.end() :], "UPDATE")
        n = update_table(spark, m.group(1), cond or "true", _assignments(set_text))
        return spark.createDataFrame([(n,)], "updated bigint")

    m = _DELETE_HEAD.match(text)
    if m:
        tail, cond = _split_where(text[m.end() :], "DELETE")
        if tail.strip():
            raise ValueError(f"unsupported DELETE syntax near: {tail.strip()[:40]!r}")
        n = delete_from(spark, m.group(1), cond or "true")
        return spark.createDataFrame([(n,)], "deleted bigint")

    if not re.match(r"^\s*MERGE\b", text, re.I):
        return None
    m = _MERGE_INTO.match(text)
    if not m:
        raise ValueError(
            "unsupported MERGE syntax — expected: MERGE INTO <table> [alias] "
            "USING <table|(subquery)> [alias] ON <cond> WHEN ..."
        )
    name, talias = m.group(1), m.group(2)
    src_text, rest = _parse_using_source(text[m.end() :])
    am = re.match(r"\s+(?:AS\s+)?(?!ON\b)(\w+)", rest, re.I)
    salias = am.group(1) if am else None
    rest = rest[am.end() :] if am else rest
    on_kw = _find_keyword(rest, "ON")
    if on_kw < 0:
        raise ValueError("unsupported MERGE syntax — missing ON condition")
    rest = rest[on_kw + 2 :]
    pieces = _WHEN_SPLIT_RE.split(rest)
    on = pieces[0].strip()
    if len(pieces) < 2:
        raise ValueError("MERGE requires at least one WHEN clause")

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
    delete_seen_at = update_seen_at = None
    for pos, clause in enumerate(pieces[1:]):
        clause = clause.strip()
        mu = _MATCHED_UPDATE_RE.match(clause)
        md = _MATCHED_DELETE_RE.match(clause)
        mi = _NOT_MATCHED_RE.match(clause)
        if mu:
            if matched_update is not None:
                raise ValueError("duplicate WHEN MATCHED ... UPDATE clause")
            update_seen_at = pos
            matched_update = {
                c: canon(e) for c, e in _assignments(mu.group(1).rstrip("; \n")).items()
            }
        elif md:
            if matched_delete is not None:
                raise ValueError("duplicate WHEN MATCHED ... DELETE clause")
            delete_seen_at = pos
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

    # ANSI applies the FIRST matching MATCHED clause; merge_into
    # evaluates delete-before-update. The orders agree only when the
    # DELETE clause is textually first AND carries a condition —
    # enforce that instead of silently reordering the user's intent
    # (Hive/Spark likewise reject a non-final MATCHED clause with no
    # AND: the second clause would be unreachable).
    if matched_update is not None and matched_delete is not None:
        if delete_seen_at > update_seen_at:
            raise ValueError(
                "unsupported MERGE clause order: WHEN MATCHED ... DELETE must "
                "precede WHEN MATCHED ... UPDATE (delete-first is the order "
                "this engine evaluates)"
            )
        if matched_delete == "true":
            raise ValueError(
                "WHEN MATCHED THEN DELETE followed by another MATCHED clause "
                "must carry AND <cond> — the second clause is unreachable "
                "otherwise"
            )

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
