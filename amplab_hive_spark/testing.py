"""Parity harness: run a registered query on Spark AND its DuckDB
oracle, compare row count, column names, and order-insensitive
values — a local replica of the driver's CORRECTNESS gate and of the
reference's QTestUtil golden-diff flow (SURVEY.md §5.1:
SortPrintStream normalization → here: sorted-row canonical compare).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os

import duckdb

from amplab_hive_spark.catalog import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(v):
    """Canonical, engine-neutral value rendering."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _decimal.Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{_canon(k)}:{_canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def spark_rows(df) -> tuple[list[str], list[list[str]]]:
    cols = list(df.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [[_canon(r[i]) for i in order] for r in df.collect()]
    return sorted(c for c in cols), sorted(rows)


def duckdb_rows(con, sql: str) -> tuple[list[str], list[list[str]]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [[_canon(r[i]) for i in order] for r in cur.fetchall()]
    return sorted(c for c in cols), sorted(rows)


def compare(spark, spec, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Assert Spark result == DuckDB oracle result for one QuerySpec."""
    df = spec.fn(spark, sf_dir)
    s_cols, s_rows = spark_rows(df)
    con = duckdb_connection(sf_dir)
    try:
        d_cols, d_rows = duckdb_rows(con, spec.oracle)
    finally:
        con.close()
    assert s_cols == d_cols, f"{spec.name}: column mismatch spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{spec.name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
        raise AssertionError(f"{spec.name}: value mismatch, first diffs: {diffs}")
