"""Unit tests for the Hive-compat helpers (SURVEY §2.6 gap set) and
the matchpath PTF engine, mirroring the reference's per-UDF tests.
"""

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from amplab_hive_spark.functions.hive_compat import (
    create_union,
    field,
    in_file,
    parse_url_tuple,
    union_field,
    union_tag,
)
from amplab_hive_spark.operators.matchpath import matchpath


def test_field_helper(spark):
    df = spark.createDataFrame([Row(v="b"), Row(v="z"), Row(v="a")])
    out = [r["f"] for r in df.select(field(F.col("v"), "a", "b", "c").alias("f")).collect()]
    assert out == [2, 0, 1]


def test_parse_url_tuple(spark):
    df = spark.createDataFrame([Row(url="http://h.io:99/p/q?x=1&y=2#frag")])
    r = df.select(*parse_url_tuple(F.col("url"), "HOST", "PATH", "QUERY:y", "REF")).first()
    assert (r["host"], r["path"], r["QUERY_y"], r["ref"]) == ("h.io", "/p/q", "2", "frag")


def test_union_type_roundtrip(spark):
    df = spark.createDataFrame([Row(tag=0, s="hello", n=7), Row(tag=1, s="x", n=42)])
    u = create_union(F.col("tag"), F.col("s"), F.col("n").cast("string"))
    out = df.select(
        union_tag(u).alias("t"), union_field(u, 0).alias("f0"), union_field(u, 1).alias("f1")
    ).collect()
    assert (out[0]["t"], out[0]["f0"], out[0]["f1"]) == (0, "hello", None)
    assert (out[1]["t"], out[1]["f0"], out[1]["f1"]) == (1, None, "42")


def test_in_file(spark, tmp_path):
    p = tmp_path / "whitelist.txt"
    p.write_text("alpha\nbeta\n")
    df = spark.createDataFrame([Row(v="alpha"), Row(v="gamma")])
    out = [r["m"] for r in df.select(in_file(F.col("v"), str(p)).alias("m")).collect()]
    assert out == [True, False]


def test_matchpath_generic_pattern(spark):
    """V-shape pattern D+U+ (down-run then up-run) on a toy series."""
    rows = [Row(g=1, i=i, x=x) for i, x in enumerate([5, 4, 3, 6, 7, 2, 1, 9])]
    df = spark.createDataFrame(rows)
    schema = StructType(
        [
            StructField("g", LongType()),
            StructField("start_i", LongType()),
            StructField("length", LongType()),
        ]
    )
    out = matchpath(
        df,
        partition_by=["g"],
        order_by=["i"],
        symbols={
            "D": lambda p: p["x"] < p["x"].shift(1),
            "U": lambda p: p["x"] > p["x"].shift(1),
        },
        pattern="D+U+",
        result_schema=schema,
        emit=lambda p, s, e: {"g": 1, "start_i": int(p["i"].iloc[s]), "length": e - s},
    ).collect()
    # series symbols: ? D D U U D D U → matches "DDUU" (i=1..4), "DDU" (i=5..7)
    assert [(r["start_i"], r["length"]) for r in sorted(out, key=lambda r: r["start_i"])] == [
        (1, 4),
        (5, 3),
    ]


def test_matchpath_zero_width_pattern_does_not_abort_scan(spark):
    """Regression: a pattern that can match the empty string (U*)
    produced a zero-width match at position 0 and the scanner BROKE
    out of the loop, silently dropping every real match later in the
    partition. Zero-width matches must be skipped by advancing."""
    rows = [Row(g=1, i=i, x=x) for i, x in enumerate([5, 4, 6, 7, 3])]
    df = spark.createDataFrame(rows)
    schema = StructType(
        [
            StructField("g", LongType()),
            StructField("start_i", LongType()),
            StructField("length", LongType()),
        ]
    )
    out = matchpath(
        df,
        partition_by=["g"],
        order_by=["i"],
        symbols={"U": lambda p: p["x"] > p["x"].shift(1)},
        pattern="U*",  # zero-width-capable; real runs are i=2..3
        result_schema=schema,
        emit=lambda p, s, e: {"g": 1, "start_i": int(p["i"].iloc[s]), "length": e - s},
    ).collect()
    assert [(r["start_i"], r["length"]) for r in out] == [(2, 2)]


def test_ngrams_short_documents_contribute_nothing(spark):
    """Regression: a document with fewer tokens than n made
    sequence(0, size-n) step DOWNWARD and slice(..., 0, ...) raised
    at runtime (and the i=0 element emitted a truncated gram). Short
    docs now yield an empty gram array, matching the oracle's empty
    range()."""
    from amplab_hive_spark.functions.hive_compat import context_ngrams, top_ngrams

    df = spark.createDataFrame(
        [Row(text="one"), Row(text=""), Row(text="alpha beta alpha beta")]
    )
    out = {r["ngram"]: r["estfrequency"] for r in top_ngrams(df, "text", 2, 10).collect()}
    assert out == {"alpha beta": 2, "beta alpha": 1}
    ctx = {r["ngram"]: r["estfrequency"]
           for r in context_ngrams(df, "text", ["alpha", None], 10).collect()}
    assert ctx == {"beta": 2}


def test_salted_join_rejects_outer_how(spark):
    """right/full outer under salting would emit one null-extended
    row per salt replica for unmatched small-side rows — rejected."""
    import pytest as _pytest

    from amplab_hive_spark.operators.skew import salted_join

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "k2")
    with _pytest.raises(ValueError, match="salted_join supports"):
        salted_join(big, small, "k", "k2", salt=4, how="full")
    # the supported shapes still produce exact results
    got = salted_join(big, small, "k", "k2", salt=4, how="inner").count()
    assert got == 3
