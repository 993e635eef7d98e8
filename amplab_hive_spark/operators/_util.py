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


# ---------------------------------------------------------------------------
# Integer-units ("cents") money arithmetic — optimization round r14.
#
# The decimal pipeline above is exact but pays a BigDecimal boxing per
# row inside Spark's hash aggregate (decimal(38,·) values are stored
# non-compact; Decimal.+ falls off its fast path), measured ~2× the
# whole of q1 at sf0.1. For the 2-decimal money columns the same exact
# value fits a LONG in fixed-point units (cents = 1e-2, e4 = 1e-4,
# e6 = 1e-6 units): products and sums become codegen'd 64-bit integer
# ops, and the ONE decimal conversion happens per GROUP, not per row.
#
# Equivalence contract (pinned by tests/test_cents_money.py and the
# DuckDB oracle parity suite):
#   * cents(x) == unscaled(cast(x as decimal(p,2))) for every value in
#     the testdata money/rate columns (exactly-2-decimal doubles; the
#     driver generates them that way — TESTDATA.md). Both paths round
#     HALF_UP; they can only diverge on pathological >2-decimal
#     doubles whose ×100 product is correctly rounded across a half
#     boundary, which 2-decimal data cannot produce.
#   * integer sums grouped ANY way re-sum to the same total, so
#     partial long sums per Spark partition + a final decimal sum of
#     the partials equal the row-level decimal sum exactly.
#   * units_double() divides the exact integer total by 10^scale in
#     decimal (exact: the quotient is representable at the result
#     scale) and casts to double — BigDecimal.doubleValue and the
#     oracle's CAST(decimal AS DOUBLE) are both correctly rounded, so
#     the final doubles are bit-identical.
#
# Overflow headroom (the 100 TB bar): per-row e6 units of a charge-
# like value are ≤ ~1.2e11; a per-partition partial over R rows is
# ≤ 1.2e11·R, so R must stay under ~7e7 rows (~1.5 GB splits) with a
# bare spark_partition_id partial key. r15 (ADVICE r14): q1's partial
# key now ALSO sub-buckets by pmod(l_orderkey, 64), making the wrap
# point ~4.5e9 rows (~1 TB of lineitem parquet) PER SCAN SPLIT — a
# structural guarantee instead of a split-size comment, measured free
# at sf0.1. New unbounded-group consumers should copy that sub-bucket.
# The FINAL total (which can exceed a long at 100 TB) is summed in
# decimal(38,0) — only #partitions × #groups × #buckets rows deep.
# Bounded-group sums (lineitems per order, etc.) may skip the
# two-level split and long-sum directly.


def cents(col: Column | str, dp: int = 2) -> Column:
    """Exact fixed-point units of a ``dp``-decimal double, as LONG.

    ``x*10^dp + 0.5`` floored is HALF_UP for the non-negative money/
    rate columns; see the equivalence contract above."""
    return (_c(col) * (10**dp) + 0.5).cast("long")


def units_double(col: Column | str, dp: int) -> Column:
    """LONG total in 1e-``dp`` units → exact decimal → double.

    ``decimal(38,0)/10^dp`` is exact (scale of the true quotient ≤ dp
    ≤ result scale), so the double is the correctly-rounded value of
    the exact total — identical to the decimal pipeline's final cast."""
    return (_c(col).cast("decimal(38,0)") / (10**dp)).cast("double")


def dsum_units(col: Column | str, alias: str, dp: int) -> Column:
    """Exact money sum for BOUNDED groups (per-group row count small
    enough that the long cannot overflow — e.g. lineitems per order),
    surfaced as double like :func:`dsum`."""
    return units_double(F.sum(_c(col)), dp).alias(alias)


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
