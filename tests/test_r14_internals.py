"""Focused pins for r14 optimization internals.

1. matchpath's mapInPandas group-stitching: a partition's rows reach
   the Python worker as MULTIPLE Arrow batches, and a group that
   straddles a batch boundary must be carried into the next batch —
   matches must be identical to the small-batch-free run.
2. dedup_simhash's Arrow signature twin must be bit-identical to the
   JVM higher-order fold it replaced, on the real driver corpus.
"""

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.llm.dedup import _SIMHASH_BITS, simhash_signatures_arrow
from amplab_hive_spark.operators.matchpath import matchpath


def _runs(spark, rows):
    schema = StructType(
        [
            StructField("g", LongType()),
            StructField("start_i", LongType()),
            StructField("length", LongType()),
        ]
    )
    out = matchpath(
        spark.createDataFrame(rows),
        partition_by=["g"],
        order_by=["i"],
        symbols={
            "U": lambda p: p["x"] > p["x"].shift(1),
            "F": lambda p: ~(p["x"] > p["x"].shift(1)),
        },
        pattern="FU{2,}",
        result_schema=schema,
        emit=lambda p, s, e: {
            "g": int(p["g"].iloc[s]),
            "start_i": int(p["i"].iloc[s]),
            "length": e - s,
        },
    ).collect()
    return sorted((r["g"], r["start_i"], r["length"]) for r in out)


def test_matchpath_group_straddling_arrow_batches(spark):
    """One group larger than the Arrow batch size plus neighbors on
    both sides: with maxRecordsPerBatch=7 the big group arrives split
    across several batches and must be stitched, not matched
    piecewise (a piecewise match would fracture the long ascending
    run into several shorter ones)."""
    rows = []
    # group 1: strictly ascending run of 25 (one match, length 25)
    rows += [Row(g=1, i=i, x=float(i)) for i in range(25)]
    # group 2: no match (descending)
    rows += [Row(g=2, i=i, x=float(-i)) for i in range(5)]
    # group 3: ascending run of 4
    rows += [Row(g=3, i=i, x=float(i)) for i in range(4)]
    expected = _runs(spark, rows)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = _runs(spark, rows)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == expected
    assert (1, 0, 25) in got, "the straddling group must match as ONE run"


def test_matchpath_group_boundary_on_batch_edge(spark):
    """r15 carry-as-piece-list regression pin: a group ending EXACTLY
    at an Arrow batch edge (sizes multiples of the 7-row batch) plus a
    group spanning 3+ full batches — the carried pieces must be
    concatenated once at the key change, and a boundary-aligned group
    must not leak into or swallow its successor."""
    rows = []
    # group 1: exactly 14 rows (2 full batches), ascending (one match)
    rows += [Row(g=1, i=i, x=float(i)) for i in range(14)]
    # group 2: exactly 21 rows (3 full batches), ascending
    rows += [Row(g=2, i=i, x=float(i)) for i in range(21)]
    # group 3: 1 row (no match possible)
    rows += [Row(g=3, i=0, x=0.0)]
    expected = _runs(spark, rows)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = _runs(spark, rows)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == expected
    assert (1, 0, 14) in got and (2, 0, 21) in got


def test_simhash_arrow_twin_bit_identical_to_jvm_fold(spark, sf_dir):
    """The Arrow signature path must reproduce the JVM double-fold's
    sig64 exactly, doc by doc, on the real corpus (the portable
    md5→60-bit bridge + integer votes admit no rounding, so any
    diff is a bug)."""
    t = tables(spark, sf_dir)
    # Null-text docs are dropped by the Arrow path (no signature);
    # the JVM fold would emit them with NULL sig64 — equivalent
    # downstream (NULL sigs never join) but not dict-equal, so pin
    # the SIGNATURE equivalence on non-null texts only (ADVICE r14).
    jvm = t.documents.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.expr(
            "transform(array_distinct(split(lower(text), ' ')), "
            "t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
        ).alias("h"),
    ).select(
        "doc_id",
        F.expr(
            f"""
aggregate(
  sequence(0, {_SIMHASH_BITS - 1}),
  cast(0 as bigint),
  (acc, bit) -> acc + shiftleft(
      cast(aggregate(h, 0, (a, x) ->
           a + IF((shiftright(x, bit) & 1) = 1, 1, -1)) > 0 as bigint),
      bit)
)
"""
        ).alias("sig64"),
    )
    arrow = simhash_signatures_arrow(t.documents)
    a = {r["doc_id"]: r["sig64"] for r in jvm.collect()}
    b = {r["doc_id"]: r["sig64"] for r in arrow.collect()}
    assert a == b
