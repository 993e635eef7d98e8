"""Scalar function surface (SURVEY.md §2.6): string, math, date/
time, conditional, and hash functions — the reference registers ~216
of these in QL/exec/FunctionRegistry.java (string :175-247, math
:187-218,282-292, date :252-268,294-297, conditional :299-317,
complex :378-399, hash/misc :294-297).

Spark has built-in equivalents for essentially all of them
(pyspark.sql.functions — JVM expressions inside whole-stage codegen,
never Python). These queries exercise the surface broadly with
DuckDB-oracleable expressions; functions whose cross-engine output
cannot be bit-identical (libm transcendentals, engine-specific
hashes, locale formatting) are covered by tests/test_function_gaps.py
with literal/tolerance assertions instead.

Numeric policy: only IEEE-exact operations (arithmetic, sqrt,
integer pow, floor/ceil/round-on-decimal) appear in oracled columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register


@register(
    "fn_string_suite",
    tags=("function", "string"),
    oracle="""
SELECT p_partkey,
       concat(p_brand, '#', p_type)                     AS brand_type,
       upper(p_name)                                    AS uname,
       lower(p_brand)                                   AS lbrand,
       length(p_name)                                   AS name_len,
       substr(p_name, 1, 5)                             AS name_head,
       reverse(p_brand)                                 AS rbrand,
       trim('  ' || p_brand || ' ')                     AS trimmed,
       lpad(CAST(p_size AS VARCHAR), 4, '0')            AS padded_size,
       rpad(p_brand, 12, '.')                           AS padded_brand,
       repeat('-', 3)                                   AS dashes,
       ascii(p_brand)                                   AS first_ascii,
       strpos(p_name, 'a')                              AS a_pos,
       string_split(p_type, ' ')[1]                     AS type_head,
       concat_ws('|', p_brand, p_type)                  AS joined,
       translate(p_brand, '#', '_')                     AS translated,
       regexp_replace(p_name, '[aeiou]', '*', 'g')      AS devoweled,
       regexp_extract(p_type, '([A-Za-z]+)$', 1)        AS type_tail,
       levenshtein(p_brand, 'Brand#00')                 AS lev_dist,
       p_name LIKE '%al%'                               AS has_al,
       regexp_matches(p_type, '^[A-Z]')                 AS starts_upper
FROM part
WHERE p_partkey % 50 = 7
""",
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (FunctionRegistry.java:175-247):
    concat/upper/lower/length/substr/reverse/trim/lpad/rpad/repeat/
    ascii/instr/split/concat_ws/translate/regexp_replace/
    regexp_extract/levenshtein/like/rlike."""
    t = tables(spark, sf_dir)
    return t.part.filter(F.col("p_partkey") % 50 == 7).select(
        "p_partkey",
        F.concat("p_brand", F.lit("#"), "p_type").alias("brand_type"),
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.reverse("p_brand").alias("rbrand"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.rpad("p_brand", 12, ".").alias("padded_brand"),
        F.repeat(F.lit("-"), 3).alias("dashes"),
        F.ascii("p_brand").alias("first_ascii"),
        F.instr("p_name", "a").alias("a_pos"),
        F.split("p_type", " ").getItem(0).alias("type_head"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.translate("p_brand", "#", "_").alias("translated"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.regexp_extract("p_type", "([A-Za-z]+)$", 1).alias("type_tail"),
        F.levenshtein("p_brand", F.lit("Brand#00")).alias("lev_dist"),
        F.col("p_name").like("%al%").alias("has_al"),
        F.col("p_type").rlike("^[A-Z]").alias("starts_upper"),
    )


@register(
    "fn_math_suite",
    tags=("function", "math"),
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST((CAST(round(l_extendedprice * 100, 0) AS BIGINT) + 500) // 1000 AS DOUBLE) / 10
                                              AS price_hundreds,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT)  AS price_ceil,
       abs(-l_quantity)                       AS abs_qty,
       CAST(sign(l_quantity - 25) AS INT)     AS sign_qty,
       sqrt(l_quantity)                       AS sqrt_qty,
       pow(CAST(l_linenumber AS INT), 3)      AS cube_line,
       CAST(l_quantity AS BIGINT) % 7         AS qty_mod7,
       ((CAST(l_quantity AS BIGINT) - 30) % 7 + 7) % 7 AS qty_pmod7,
       CAST(l_quantity AS BIGINT) // 8        AS qty_div8,
       xor(CAST(l_quantity AS BIGINT), 21)    AS qty_xor,
       CAST(l_quantity AS BIGINT) & 15        AS qty_and,
       CAST(l_quantity AS BIGINT) | 64        AS qty_or,
       hex(CAST(l_quantity AS BIGINT))        AS qty_hex,
       bin(CAST(l_quantity AS BIGINT))        AS qty_bin,
       greatest(l_quantity, l_linenumber * 10.0) AS biggest,
       least(l_quantity, l_linenumber * 10.0)    AS smallest
FROM lineitem
WHERE l_orderkey % 500 = 9
""",
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface (FunctionRegistry.java:187-218,282-292) limited
    to IEEE-exact ops: round/floor/ceil/abs/sign/sqrt/pow(int)/mod/
    pmod/intdiv/bitwise/hex/bin/greatest/least. Transcendentals are
    libm-dependent → tests/test_function_gaps.py."""
    t = tables(spark, sf_dir)
    qty = F.col("l_quantity").cast("bigint")
    return t.lineitem.filter(F.col("l_orderkey") % 500 == 9).select(
        "l_orderkey",
        "l_linenumber",
        # HALF_UP round of price/100 to 1 decimal in INTEGER-CENT
        # arithmetic, not round() on a double: Spark rounds the
        # shortest decimal string (0.285 -> 0.29) while DuckDB rounds
        # the binary value (0.285 -> 0.28), so a price landing on a
        # .x45 tie would diverge. Cents are exact in double, so
        # round(*100, 0) is unambiguous and (n+500) div 1000 IS
        # HALF_UP at the 0.1 place, identically on both engines.
        (
            F.floor(
                (F.round(F.col("l_extendedprice") * 100, 0).cast("bigint") + 500) / 1000
            ).cast("double")
            / 10
        ).alias("price_hundreds"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(-F.col("l_quantity")).alias("abs_qty"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("sign_qty"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.pow(F.col("l_linenumber").cast("int"), F.lit(3)).alias("cube_line"),
        (qty % 7).alias("qty_mod7"),
        F.pmod(qty - 30, F.lit(7)).alias("qty_pmod7"),
        (qty / 8).cast("bigint").alias("qty_div8"),
        qty.bitwiseXOR(F.lit(21)).alias("qty_xor"),
        qty.bitwiseAND(F.lit(15)).alias("qty_and"),
        qty.bitwiseOR(F.lit(64)).alias("qty_or"),
        F.hex(qty).alias("qty_hex"),
        F.bin(qty).alias("qty_bin"),
        F.greatest("l_quantity", F.col("l_linenumber") * 10.0).alias("biggest"),
        F.least("l_quantity", F.col("l_linenumber") * 10.0).alias("smallest"),
    )


@register(
    "fn_date_suite",
    tags=("function", "datetime"),
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE)                          AS order_date,
       year(o_orderdate)                                  AS yr,
       month(o_orderdate)                                 AS mo,
       day(o_orderdate)                                   AS dy,
       quarter(o_orderdate)                               AS qtr,
       dayofweek(o_orderdate) + 1                         AS dow,
       dayofyear(o_orderdate)                             AS doy,
       weekofyear(o_orderdate)                            AS wk,
       CAST(o_orderdate + 30 * INTERVAL 1 DAY AS DATE)    AS plus30,
       CAST(o_orderdate - 90 * INTERVAL 1 DAY AS DATE)    AS minus90,
       date_diff('day', o_orderdate, TIMESTAMP '1998-12-01 00:00:00') AS days_to_end,
       CAST(o_orderdate + 3 * INTERVAL 1 MONTH AS DATE)   AS plus3mo,
       last_day(CAST(o_orderdate AS DATE))                AS month_end,
       CAST(date_trunc('month', o_orderdate) AS DATE)     AS month_start,
       strftime(o_orderdate, '%Y-%m')                     AS ym,
       CAST(epoch(o_orderdate) AS BIGINT)                 AS unix_ts
FROM orders
WHERE o_orderkey % 400 = 11
""",
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface (FunctionRegistry.java:252-268,405-409):
    year/month/day/quarter/dayofweek/dayofyear/weekofyear/date_add/
    date_sub/datediff/add_months/last_day/trunc/date_format/
    unix_timestamp. Hive's TZ-less timestamps → session TZ pinned to
    UTC (session.py) so epoch values agree with the oracle."""
    t = tables(spark, sf_dir)
    d = F.col("o_orderdate")
    return t.orders.filter(F.col("o_orderkey") % 400 == 11).select(
        "o_orderkey",
        d.cast("date").alias("order_date"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.quarter(d).alias("qtr"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("wk"),
        F.date_add(d.cast("date"), 30).alias("plus30"),
        F.date_sub(d.cast("date"), 90).alias("minus90"),
        F.datediff(F.lit("1998-12-01").cast("timestamp"), d).alias("days_to_end"),
        F.add_months(d.cast("date"), 3).alias("plus3mo"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.unix_timestamp(d).alias("unix_ts"),
    )


@register(
    "fn_conditional_suite",
    tags=("function", "conditional"),
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'rich' END                              AS wealth_band,
       CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_building,
       coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'n/a') AS seg_or_na,
       c_acctbal BETWEEN 0 AND 1000                      AS small_positive,
       c_mktsegment IN ('BUILDING', 'MACHINERY')         AS in_two_segs,
       c_acctbal IS NOT NULL                             AS bal_not_null,
       c_mktsegment IS NOT DISTINCT FROM 'BUILDING'      AS null_safe_eq,
       greatest(c_acctbal, 0.0)                          AS bal_clamped,
       if(c_acctbal > 9000, 'vip', 'std')                AS tier
FROM customer
WHERE c_custkey % 120 = 13
""",
)
def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionals & predicates (FunctionRegistry.java:299-317):
    case/when, if, coalesce, nullif, nvl, between, in, isnotnull,
    <=> (null-safe equal), greatest."""
    t = tables(spark, sf_dir)
    bal = F.col("c_acctbal")
    return t.customer.filter(F.col("c_custkey") % 120 == 13).select(
        "c_custkey",
        F.when(bal < 0, "debt").when(bal < 5000, "mid").otherwise("rich").alias("wealth_band"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("is_building"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("n/a")).alias("seg_or_na"),
        bal.between(0, 1000).alias("small_positive"),
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY").alias("in_two_segs"),
        bal.isNotNull().alias("bal_not_null"),
        F.col("c_mktsegment").eqNullSafe(F.lit("BUILDING")).alias("null_safe_eq"),
        F.greatest(bal, F.lit(0.0)).alias("bal_clamped"),
        F.when(bal > 9000, "vip").otherwise("std").alias("tier"),
    )


@register(
    "fn_hash_suite",
    tags=("function", "hash"),
    oracle="""
SELECT n_nationkey,
       md5(n_name)                       AS name_md5,
       sha256(n_name)                    AS name_sha256,
       md5(concat(n_name, ':', CAST(n_regionkey AS VARCHAR))) AS compound_md5
FROM nation
ORDER BY n_nationkey
""",
)
def fn_hash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic cross-engine hashes: md5 / sha2-256 (reference
    registers hash/md5-era functions at FunctionRegistry.java:294).
    Spark's murmur3 `hash`/`xxhash64` are engine-specific → covered
    in tests/test_function_gaps.py instead."""
    t = tables(spark, sf_dir)
    return t.nation.select(
        "n_nationkey",
        F.md5("n_name").alias("name_md5"),
        F.sha2("n_name", 256).alias("name_sha256"),
        F.md5(F.concat("n_name", F.lit(":"), F.col("n_regionkey").cast("string"))).alias(
            "compound_md5"
        ),
    ).orderBy("n_nationkey")
