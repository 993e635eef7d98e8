"""Pins for the r14 integer fixed-point ("cents") money arithmetic
(`operators/_util.py::cents/units_double/dsum_units`).

The optimization replaced per-row decimal(38,·) aggregation with
exact LONG fixed-point sums + a per-group decimal conversion. These
tests pin the equivalence contract on the REAL driver data:

1. `cents(x)` equals the unscaled value of `CAST(x AS DECIMAL(18,dp))`
   for every row of every money/rate column (both paths round
   HALF_UP; 2-decimal data cannot land between them).
2. The rewritten q1 / q18 aggregates are BIT-identical (struct-packed
   doubles, not approx-equal) to their original decimal(38,·)
   formulations, re-derived here from the same helpers the old code
   used.
"""

import math
import struct

import pytest
from pyspark.sql import functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.operators._util import (
    cents,
    charge,
    davg,
    disc_price,
    dsum,
    units_double,
)
from amplab_hive_spark.registry import all_queries


def _bits(rows):
    return [
        tuple(
            struct.pack(">d", v).hex()
            if isinstance(v, float) and not math.isnan(v)
            else v
            for v in r
        )
        for r in rows
    ]


@pytest.mark.parametrize(
    "col,dp",
    [
        ("l_extendedprice", 2),
        ("l_discount", 2),
        ("l_tax", 2),
        ("l_quantity", 2),
    ],
)
def test_cents_equals_decimal_unscaled_on_every_row(spark, sf_dir, col, dp):
    t = tables(spark, sf_dir)
    mismatch = (
        t.lineitem.select(
            cents(col, dp).alias("c"),
            (F.col(col).cast(f"decimal(18,{dp})") * (10**dp))
            .cast("long")
            .alias("d"),
        )
        .filter(F.col("c") != F.col("d"))
        .count()
    )
    assert mismatch == 0


def test_units_double_matches_decimal_cast(spark, sf_dir):
    """units_double(total, dp) == CAST(decimal-total AS DOUBLE) for the
    actual column totals — the correctly-rounded-division argument,
    checked end-to-end."""
    t = tables(spark, sf_dir)
    row = t.lineitem.select(
        units_double(F.sum(cents("l_extendedprice")), 2).alias("a"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,2)"))
        .cast("double")
        .alias("b"),
    ).collect()[0]
    assert struct.pack(">d", row["a"]) == struct.pack(">d", row["b"])


def test_q1_bit_identical_to_decimal_formulation(spark, sf_dir):
    t = tables(spark, sf_dir)
    old = (
        t.lineitem.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price(), "sum_disc_price"),
            dsum(charge(), "sum_charge", scale=6),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    new = all_queries()["q1_pricing_summary"].fn(spark, sf_dir)
    assert _bits(old.collect()) == _bits(new.collect())


def test_q18_bit_identical_to_decimal_formulation(spark, sf_dir):
    t = tables(spark, sf_dir)
    old = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
        .orderBy("l_orderkey")
    )
    new_big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(cents("l_quantity")).alias("q2"))
        .filter(F.col("q2") > 25000)
        .select("l_orderkey", units_double("q2", 2).alias("total_qty"))
        .orderBy("l_orderkey")
    )
    assert _bits(old.collect()) == _bits(new_big.collect())
