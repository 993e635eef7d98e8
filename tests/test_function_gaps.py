"""Functions with no bit-identical cross-engine oracle: Spark-only
builtins, libm transcendentals, engine-specific hashes, and the
Hive-gap UDFs the reference registers that Spark also covers
(SURVEY.md §2.6). Assertions are literal values or tolerances,
mirroring the reference's per-UDF unit tests
(ql/src/test/org/apache/hadoop/hive/ql/udf/).
"""

import math

import pytest
from pyspark.sql import Row, functions as F


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_initcap(spark):
    assert one(spark, F.initcap(F.lit("hello spark world"))) == "Hello Spark World"


def test_format_number(spark):
    assert one(spark, F.format_number(F.lit(1234567.891), 2)) == "1,234,567.89"


def test_elt_field(spark):
    # elt: 1-based variadic indexing (FunctionRegistry elt)
    assert one(spark, F.elt(F.lit(2), F.lit("a"), F.lit("b"), F.lit("c"))) == "b"
    # field ≈ array_position idiom (reference `field`, no Spark builtin)
    assert (
        one(spark, F.array_position(F.array(F.lit("a"), F.lit("b"), F.lit("c")), "b")) == 2
    )


def test_find_in_set(spark):
    assert one(spark, F.find_in_set(F.lit("b"), F.lit("a,b,c"))) == 2


def test_parse_url(spark):
    url = F.lit("https://example.com:8080/path/page?q=spark&lang=py")
    assert one(spark, F.parse_url(url, F.lit("HOST"))) == "example.com"
    assert one(spark, F.parse_url(url, F.lit("PATH"))) == "/path/page"
    assert one(spark, F.parse_url(url, F.lit("QUERY"), F.lit("q"))) == "spark"


def test_sentences(spark):
    out = one(spark, F.sentences(F.lit("Hello there. How are you?")))
    assert out == [["Hello", "there"], ["How", "are", "you"]]


def test_transcendentals_match_libm(spark):
    """exp/ln/log10/sin/cos/atan vs CPython libm within 1 ulp-ish."""
    row = (
        spark.range(1)
        .select(
            F.exp(F.lit(1.5)).alias("exp"),
            F.log(F.lit(2.5)).alias("ln"),
            F.log10(F.lit(123.0)).alias("log10"),
            F.log2(F.lit(10.0)).alias("log2"),
            F.sin(F.lit(0.7)).alias("sin"),
            F.cos(F.lit(0.7)).alias("cos"),
            F.atan(F.lit(0.3)).alias("atan"),
            F.degrees(F.lit(math.pi)).alias("deg"),
            F.radians(F.lit(180.0)).alias("rad"),
        )
        .first()
    )
    assert row["exp"] == pytest.approx(math.exp(1.5), rel=1e-15)
    assert row["ln"] == pytest.approx(math.log(2.5), rel=1e-15)
    assert row["log10"] == pytest.approx(math.log10(123.0), rel=1e-15)
    assert row["log2"] == pytest.approx(math.log2(10.0), rel=1e-15)
    assert row["sin"] == pytest.approx(math.sin(0.7), rel=1e-15)
    assert row["cos"] == pytest.approx(math.cos(0.7), rel=1e-15)
    assert row["atan"] == pytest.approx(math.atan(0.3), rel=1e-15)
    assert row["deg"] == pytest.approx(180.0, rel=1e-15)
    assert row["rad"] == pytest.approx(math.pi, rel=1e-15)


def test_conv_base64_encode_decode(spark):
    assert one(spark, F.conv(F.lit("ff"), 16, 10)) == "255"
    assert one(spark, F.conv(F.lit("255"), 10, 2)) == "11111111"
    assert one(spark, F.base64(F.lit("spark").cast("binary"))) == "c3Bhcms="
    assert one(spark, F.unbase64(F.lit("c3Bhcms=")).cast("string")) == "spark"
    assert one(spark, F.encode(F.lit("é"), "utf-8").cast("binary")) == b"\xc3\xa9"
    assert one(spark, F.decode(F.encode(F.lit("é"), "utf-8"), "utf-8")) == "é"


def test_engine_hashes_deterministic(spark):
    """murmur3 hash / xxhash64 / crc32 — engine-specific but must be
    stable across runs (used for bucketing/sampling)."""
    a = one(spark, F.hash(F.lit("spark")))
    b = one(spark, F.hash(F.lit("spark")))
    assert a == b
    assert one(spark, F.xxhash64(F.lit("spark"))) == one(spark, F.xxhash64(F.lit("spark")))
    import zlib

    assert one(spark, F.crc32(F.lit("spark").cast("binary"))) == zlib.crc32(b"spark")


def test_next_day_weekday_functions(spark):
    from datetime import date

    assert one(spark, F.next_day(F.lit("2024-01-01").cast("date"), "Mon")) == date(2024, 1, 8)
    assert one(spark, F.next_day(F.lit("2024-01-01").cast("date"), "Tue")) == date(2024, 1, 2)
    assert one(spark, F.months_between(
        F.lit("2024-03-31").cast("date"), F.lit("2024-01-31").cast("date")
    )) == 2.0


def test_str_to_map_multi(spark):
    out = one(spark, F.str_to_map(F.lit("a:1,b:2"), F.lit(","), F.lit(":")))
    assert out == {"a": "1", "b": "2"}


def test_get_json_object_nested(spark):
    j = F.lit('{"a": {"b": [1, 2, 3]}, "c": "x"}')
    assert one(spark, F.get_json_object(j, "$.a.b[1]")) == "2"
    assert one(spark, F.get_json_object(j, "$.c")) == "x"
    r = spark.range(1).select(
        F.json_tuple(F.lit('{"k1": "v1", "k2": "v2"}'), "k1", "k2").alias("a", "b")
    ).first()
    assert (r["a"], r["b"]) == ("v1", "v2")


def test_null_sort_order_hive_semantics(spark):
    """Hive: NULLS FIRST on ASC, NULLS LAST on DESC (SURVEY §7.3)."""
    df = spark.createDataFrame([Row(x=1), Row(x=None), Row(x=2)])
    asc = [r["x"] for r in df.orderBy(F.asc_nulls_first("x")).collect()]
    desc = [r["x"] for r in df.orderBy(F.desc_nulls_last("x")).collect()]
    assert asc == [None, 1, 2]
    assert desc == [2, 1, None]
