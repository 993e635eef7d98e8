"""Hive semantics deltas beyond the oracled query
(functions/semantics.py): decimal precision promotion and implicit
comparison casts — asserted on Spark *types*, which the row-value
oracle can't see (SURVEY §1.3, §7.3)."""

from decimal import Decimal

import pytest


def _type_of(spark, expr: str) -> str:
    return dict(spark.sql(f"SELECT {expr} AS x").dtypes)["x"]


def test_decimal_addition_promotes_scale_and_precision(spark):
    # D(18,2) + D(6,3) → D(20,3): scale = max, precision fits carry
    t = _type_of(spark, "CAST(1 AS DECIMAL(18,2)) + CAST(1 AS DECIMAL(6,3))")
    assert t == "decimal(20,3)"


def test_decimal_multiplication_adds_scales(spark):
    t = _type_of(spark, "CAST(1 AS DECIMAL(18,2)) * CAST(1 AS DECIMAL(6,2))")
    assert t == "decimal(25,4)"


def test_decimal_value_exactness_through_promotion(spark):
    row = spark.sql(
        "SELECT CAST(0.1 AS DECIMAL(18,2)) + CAST(0.001 AS DECIMAL(6,3)) AS x"
    ).collect()[0]
    assert row.x == Decimal("0.101")


def test_string_number_comparison_implicit_cast(spark):
    # Hive/non-ANSI: '5' = 5 compares numerically
    assert spark.sql("SELECT '5' = 5 AS eq").collect()[0].eq is True
    assert spark.sql("SELECT '05' = 5 AS eq").collect()[0].eq is True


def test_int_division_returns_double(spark):
    assert _type_of(spark, "1 / 2") == "double"
    assert spark.sql("SELECT 1 / 2 AS x").collect()[0].x == 0.5


def test_div_truncates_toward_zero(spark):
    # Hive div truncates toward zero (Java semantics): -7 div 2 = -3,
    # not floor division's -4
    assert spark.sql("SELECT -7 div 2 AS x").collect()[0].x == -3


def test_mod_sign_follows_dividend_pmod_nonnegative(spark):
    r = spark.sql("SELECT -7 % 3 AS m, pmod(-7, 3) AS p").collect()[0]
    assert r.m == -1 and r.p == 2


def test_timestamp_is_tz_less(spark):
    # session TZ is UTC; a literal renders back unchanged (no zone shift)
    r = spark.sql(
        "SELECT CAST(TIMESTAMP '1996-01-01 12:34:56' AS STRING) AS s"
    ).collect()[0]
    assert r.s == "1996-01-01 12:34:56"


def test_ansi_mode_off(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    # silent null, not error, on bad cast — the Hive behavior
    assert spark.sql("SELECT CAST('abc' AS INT) AS x").collect()[0].x is None
