"""Exhaustive function-registry audit — SURVEY §2.6 claims every
one of the reference's registered functions (FunctionRegistry.java,
~216 `system.register*` calls) maps to a Spark builtin, our compat
pack, or a documented drop. This test enumerates the registry and
proves the trichotomy, so COVERAGE.md's claim is checked, not
asserted.

Names are the reference's registration strings
(QL/exec/FunctionRegistry.java:175-439). Spark-side resolution uses
``DESCRIBE FUNCTION`` (covers builtins AND session-registered UDFs;
operators like ``+`` resolve too).
"""

import pytest

from amplab_hive_spark.engine import Engine

# FunctionRegistry.java registration names, grouped as in SURVEY §2.6.
STRING_FNS = """concat substr substring space repeat ascii lpad rpad levenshtein size
upper lower ucase lcase trim ltrim rtrim length reverse field find_in_set initcap
like rlike regexp regexp_replace regexp_extract parse_url nvl split str_to_map
translate instr locate elt concat_ws sentences format_number printf""".split()

MATH_FNS = """round floor sqrt ceil ceiling rand abs pmod ln log2 log10 log exp
power pow sign pi e degrees radians sin asin cos acos tan atan conv bin hex unhex
base64 unbase64 encode decode""".split()

DATE_FNS = """day dayofmonth month year hour minute second from_unixtime to_date
weekofyear last_day next_day date_add date_sub datediff add_months current_date
current_timestamp from_utc_timestamp to_utc_timestamp unix_timestamp
to_unix_timestamp""".split()

JSON_XPATH_FNS = """get_json_object xpath_string xpath_boolean xpath_number
xpath_double xpath_float xpath_long xpath_int xpath_short xpath""".split()

CONDITIONAL_FNS = """isnull isnotnull if in and or not between coalesce nvl
greatest least assert_true when""".split()

COMPLEX_FNS = """array map struct named_struct sort_array array_contains
map_keys map_values inline""".split()

MISC_FNS = """current_database current_user hash
reflect java_method""".split()
# reflect/java_method left the DROPPED set in r11: Spark ships the reflective
# call natively (CallMethodViaReflection — the same static-method
# semantics as Hive's GenericUDFReflect, udf_reflect.q /
# udf_java_method.q), exercised in test_reflect_java_method below.

UDAF_FNS = """max min sum count avg std stddev stddev_pop stddev_samp variance
var_pop var_samp covar_pop covar_samp corr histogram_numeric percentile
percentile_approx collect_set collect_list""".split()

WINDOW_FNS = """lead lag row_number rank dense_rank percent_rank cume_dist
ntile first_value last_value""".split()

UDTF_FNS = """explode inline json_tuple posexplode stack""".split()

OPERATORS = list("+ - * / % & | ^ ~ = == <=> != <> < <= > >= div".split())

# Gap set provided by our compat pack (functions/hive_compat.py and
# functions/bitmaps.py) as Python column-expression helpers rather
# than SQL-registered names. ewah_* moved here from DROPPED in
# round 7 (functions/bitmaps.py implements the family natively).
COMPAT_PACK = {
    "field", "parse_url_tuple", "create_union", "in_file",
    "ngrams", "context_ngrams",
    "ewah_bitmap", "ewah_bitmap_and", "ewah_bitmap_or", "ewah_bitmap_empty",
}

# Documented drops (README "Deliberately dropped"): reflect2 only —
# it invokes a method ON the value's own boxed class
# (GenericUDFReflect2), which Spark's static-call reflection cannot
# express; reflect/java_method moved to MISC_FNS in r11 (native).
DROPPED = {
    "reflect2",
    "compute_stats",  # internal; maps to ANALYZE TABLE (ddl.analyze)
    "matchpath",  # provided as operators/matchpath.py PTF, not a SQL fn
    "windowingtablefunction", "noop", "noopwithmap",  # PTF plumbing
}

SQL_RESOLVABLE = set(
    STRING_FNS + MATH_FNS + DATE_FNS + JSON_XPATH_FNS + CONDITIONAL_FNS
    + COMPLEX_FNS + MISC_FNS + UDAF_FNS + WINDOW_FNS + UDTF_FNS
) - COMPAT_PACK

# Spark spells a handful differently; the engine exposes the Hive
# name through these equivalents (all exercised in the fn_* suites).
SPARK_SPELLING = {
    "field": "array_position idiom",
    "when": "case",  # registered as CASE WHEN syntax, not a function name
    "in": "in operator",
    "and": "and operator", "or": "or operator", "not": "not operator",
    "between": "between operator",
}


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark=spark, sf_dir=sf_dir)


def test_every_reference_function_accounted_for(engine):
    spark = engine.spark
    missing = []
    for name in sorted(SQL_RESOLVABLE):
        if name in SPARK_SPELLING:
            continue
        try:
            spark.sql(f"DESCRIBE FUNCTION `{name}`").collect()
        except Exception:
            missing.append(name)
    assert not missing, f"reference functions with no Spark resolution: {missing}"


def test_operators_resolve_in_expressions(engine):
    # operators aren't DESCRIBE-able; prove them by evaluation
    row = engine.sql(
        "SELECT 7 + 2 AS a, 7 - 2 AS b, 7 * 2 AS c, 7 / 2 AS d, 7 % 2 AS e, "
        "7 div 2 AS f, 7 & 2 AS g, 7 | 2 AS h, 7 ^ 2 AS i, ~7 AS j, "
        "1 = 1 AS k, 1 == 1 AS l, NULL <=> NULL AS m, 1 != 2 AS n, 1 <> 2 AS o, "
        "1 < 2 AS p, 1 <= 1 AS q, 2 > 1 AS r, 2 >= 2 AS s"
    ).collect()[0]
    assert row.d == 3.5 and row.f == 3 and row.m is True


def test_compat_pack_importable_and_callable(spark, sf_dir):
    from amplab_hive_spark.functions import bitmaps as bm
    from amplab_hive_spark.functions import hive_compat as hc

    for fn_name in ("field", "parse_url_tuple", "create_union", "union_tag",
                    "union_field", "in_file", "top_ngrams", "context_ngrams"):
        assert callable(getattr(hc, fn_name))
    for fn_name in ("ewah_bitmap", "ewah_bitmap_and", "ewah_bitmap_or",
                    "ewah_bitmap_empty"):
        assert callable(getattr(bm, fn_name))


def test_dropped_set_documented_in_readme():
    readme = open("README.md").read()
    assert "Deliberately dropped" in readme
    for name in ("reflect", "HBase"):
        assert name in readme
    # ewah_* left the dropped set in round 7 (functions/bitmaps.py)
    assert "EWAH bitmap index UDAFs" not in readme


def test_reflect_java_method(engine):
    """udf_reflect.q / udf_java_method.q (reference:
    ql/udf/generic/GenericUDFReflect.java): static-method reflection
    is NATIVE in Spark (CallMethodViaReflection), so the r1-r10
    'dropped' classification was wrong — the reference's own test
    shapes run verbatim. reflect2 (instance methods on the value's
    boxed class, GenericUDFReflect2) remains the documented drop.
    One spelling delta: Hive coerces DECIMAL literals to double for
    the reflective call; Spark requires an explicit CAST(.. AS
    DOUBLE) (DATATYPE_MISMATCH otherwise) — same class as the §7.3
    literal-typing deltas."""
    row = engine.sql(
        """SELECT reflect('java.lang.String', 'valueOf', 1) AS a,
                  reflect('java.lang.Math', 'max', 2, 3) AS b,
                  reflect('java.lang.Math', 'min', 2, 3) AS c,
                  round(CAST(reflect('java.lang.Math', 'exp',
                             CAST(1.0 AS DOUBLE)) AS DOUBLE), 6) AS d,
                  reflect('java.lang.Integer', 'valueOf', 'ff', 16) AS e,
                  java_method('java.lang.Math', 'floor',
                              CAST(1.9 AS DOUBLE)) AS f,
                  java_method('org.apache.commons.codec.digest.DigestUtils',
                              'sha1Hex', 'ABC') AS g
        """
    ).collect()[0]
    assert (row.a, row.b, row.c) == ("1", "3", "2")
    assert row.d == 2.718282
    assert row.e == "255"
    assert row.f == "1.0"
    # udf_java_method.q's DigestUtils shape: known sha1 of 'ABC'
    assert row.g == "3c01bdbb26f358bab27f267924aa2c9a03fcfdb8"
