"""Shared helpers for oracle-deterministic aggregation.

Two distinct float hazards are handled here:

1. SUM/AVG over doubles is order-dependent — Spark's partial
   aggregation (like the reference's GroupByOperator hash-flush,
   QL/exec/GroupByOperator.java:342-390) adds in nondeterministic
   order. Fix: sum in DECIMAL (exact, associative), cast the final
   value to DOUBLE.

2. Rounding-mode divergence: ``price * (1 - discount)`` on
   2-decimal inputs produces values landing EXACTLY on the half
   point of a scale-4 decimal (e.g. 94192.85625), where Spark
   rounds HALF_UP and DuckDB HALF_EVEN. Fix: never round — cast the
   *inputs* to decimal and let decimal arithmetic carry exact
   scales (2+2→4, +2→6) end to end.

This is also the Hive-faithful semantic for money columns
(SURVEY.md §1.3 decimal promotion).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

PRICE = "decimal(18,2)"  # monetary columns (2-decimal data)
RATE = "decimal(6,2)"  # discount/tax in [0,1), 2-decimal data


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec_price(col: Column | str = "l_extendedprice") -> Column:
    return _c(col).cast(PRICE)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal (scale 4)."""
    return dec_price() * (F.lit(1) - F.col("l_discount").cast(RATE))


def charge() -> Column:
    """l_extendedprice * (1-l_discount) * (1+l_tax), exact (scale 6)."""
    return disc_price() * (F.lit(1) + F.col("l_tax").cast(RATE))


# DuckDB oracle fragments — numerically identical decimal pipelines.
O_DISC_PRICE = "(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,2))))"
O_CHARGE = f"({O_DISC_PRICE} * (1 + CAST(l_tax AS DECIMAL(6,2))))"


def dsum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Exact decimal sum, surfaced as double. Pass scale >= the
    expression's natural decimal scale so the cast never rounds."""
    return F.sum(_c(col).cast(f"decimal(38,{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 4) -> Column:
    """avg = exact decimal sum / count, divided in double at the end."""
    c = _c(col)
    return (F.sum(c.cast(f"decimal(38,{scale})")).cast("double") / F.count(c)).alias(alias)


def o_dsum(expr: str, scale: int = 4) -> str:
    """DuckDB oracle fragment equivalent to :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"


def o_davg(expr: str, scale: int = 4) -> str:
    """DuckDB oracle fragment equivalent to :func:`davg`."""
    return (
        f"(CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}))"
    )


def run_sql(spark, sf_dir: str, text: str):
    """Register the testdata views, then run ``text`` — the shim every
    SQL-surface query module shares (previously four identical private
    copies; a change to the registration contract now lands once)."""
    from amplab_hive_spark.catalog import tables

    tables(spark, sf_dir)
    return spark.sql(text)
