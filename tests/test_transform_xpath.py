"""SELECT TRANSFORM ... USING (ScriptOperator SQL syntax) and the
xpath function family (FunctionRegistry.java:270-280) — both parse
and execute natively in Spark SQL.
"""

import pytest

from amplab_hive_spark.catalog import tables


def test_transform_using_script(spark, sf_dir):
    """The reference's exact grammar (HiveParser.g:72 TOK_TRANSFORM):
    pipe rows through an external command. Spark ≥3.2 runs this
    without Hive."""
    tables(spark, sf_dir)
    out = spark.sql(
        """
SELECT TRANSFORM (r_regionkey, r_name)
  USING 'cat' AS (k STRING, name STRING)
FROM region
"""
    ).collect()
    assert len(out) == 5
    assert sorted(r["k"] for r in out) == ["0", "1", "2", "3", "4"]


def test_transform_using_pipeline_command(spark, sf_dir):
    tables(spark, sf_dir)
    out = spark.sql(
        """
SELECT TRANSFORM (n_name)
  USING 'tr a-z A-Z' AS (shout STRING)
FROM nation
"""
    ).collect()
    assert len(out) == 25
    assert all(r["shout"] == r["shout"].upper() for r in out)
    assert any("NATION_0" == r["shout"] for r in out)


def test_xpath_family(spark):
    xml = "'<a><b>one</b><b>two</b><c>3</c></a>'"
    row = spark.sql(
        f"""
SELECT xpath({xml}, 'a/b/text()')            AS items,
       xpath_string({xml}, 'a/b')            AS first_b,
       xpath_int({xml}, 'a/c')               AS c_int,
       xpath_long({xml}, 'a/c')              AS c_long,
       xpath_double({xml}, 'a/c')            AS c_dbl,
       xpath_boolean({xml}, 'a/c')           AS has_c
"""
    ).first()
    assert row["items"] == ["one", "two"]
    assert row["first_b"] == "one"
    assert row["c_int"] == 3 and row["c_long"] == 3 and row["c_dbl"] == 3.0
    assert row["has_c"] is True
