"""Ported clientpositive q-scripts (SURVEY §5.4 step 2): a curated
slice of the reference's golden-file corpus re-targeted at the
driver fixtures, run as SQL text through the engine (spark.sql) and
diffed against DuckDB running the SAME text (sort-normalized, like
QTestUtil's SortPrintStream).

Each entry cites the clientpositive script it mirrors. Only
dialect-portable SQL is used so one string serves both engines.
"""

import pytest

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.testing import duckdb_connection, duckdb_rows, spark_rows

# (name, reference q-script, portable SQL)
QSCRIPTS = [
    (
        "join1",  # clientpositive/join1.q: basic equi-join projection
        "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey",
    ),
    (
        "auto_join1",  # auto_join1.q: join + aggregation
        """SELECT r_name, COUNT(*) AS cnt
           FROM nation JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name""",
    ),
    (
        "groupby1",  # groupby1.q: single-key aggregation
        """SELECT o_orderstatus, COUNT(*) AS cnt,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
           FROM orders GROUP BY o_orderstatus""",
    ),
    (
        "groupby_cube1",  # groupby_cube1.q
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
           FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    ),
    (
        "subquery_in",  # subquery_in.q
        """SELECT c_custkey FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""",
    ),
    (
        "subquery_exists",  # subquery_exists.q
        """SELECT s_suppkey FROM supplier s
           WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s.s_suppkey
                         AND l_quantity >= 50)""",
    ),
    (
        "union_remove_1",  # union_remove_1.q: union + agg over branches
        """SELECT src, COUNT(*) AS cnt FROM (
             SELECT 'cust' AS src FROM customer WHERE c_acctbal > 5000
             UNION ALL
             SELECT 'supp' AS src FROM supplier WHERE s_acctbal > 5000
           ) u GROUP BY src""",
    ),
    (
        "windowing",  # windowing.q
        """SELECT c_custkey,
                  RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS r
           FROM customer WHERE c_custkey % 77 = 5""",
    ),
    (
        "having",  # having.q
        """SELECT o_custkey, COUNT(*) AS n FROM orders
           GROUP BY o_custkey HAVING COUNT(*) > 25""",
    ),
    (
        "cbo_simple_select",  # cbo_simple_select.q
        """SELECT p_brand, p_size FROM part
           WHERE p_size > 40 AND p_brand LIKE 'Brand%'""",
    ),
    (
        "limit_pushdown",  # limit_pushdown.q (ordered → deterministic)
        """SELECT l_orderkey, l_extendedprice FROM lineitem
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""",
    ),
    (
        "count_distinct",  # count.q / distinct family
        """SELECT COUNT(DISTINCT o_custkey) AS n_cust,
                  COUNT(DISTINCT o_orderpriority) AS n_prio
           FROM orders""",
    ),
    (
        "semijoin",  # semijoin.q (Hive rewrites IN → left semi join;
        # the IN form is the portable spelling of the same plan)
        """SELECT n_name FROM nation
           WHERE n_nationkey IN (SELECT c_nationkey FROM customer)""",
    ),
    (
        "mergejoin_negative_null",  # join with null-producing outer
        """SELECT p_partkey, l_orderkey FROM part
           LEFT JOIN lineitem ON p_partkey = l_partkey AND l_quantity >= 50
           WHERE p_partkey % 100 = 1""",
    ),
    (
        "order_null_first",  # nullgroup/ordering family
        """SELECT o_orderkey,
                  CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS st
           FROM orders WHERE o_orderkey % 211 = 3
           ORDER BY st NULLS FIRST, o_orderkey""",
    ),
]


@pytest.mark.parametrize("name,sql", [(n, s) for n, s, in QSCRIPTS])
def test_qscript(spark, sf_dir, name, sql):
    tables(spark, sf_dir)
    s_cols, s_rows = spark_rows(spark.sql(sql))
    con = duckdb_connection(sf_dir)
    try:
        d_cols, d_rows = duckdb_rows(con, sql)
    finally:
        con.close()
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert s_rows == d_rows, f"{name}: {len(s_rows)} vs {len(d_rows)} rows differ"


def test_multi_insert_from_syntax(spark, sf_dir, tmp_path):
    """The reference's multi-insert grammar (FROM t INSERT ... INSERT
    ...; HiveParser.g body statements) parses and executes natively
    in Spark SQL — one source scan, N sinks; no pre-parse shim
    needed (SURVEY §7.2 anticipated one)."""
    tables(spark, sf_dir)
    a, b = f"{tmp_path}/mi_a", f"{tmp_path}/mi_b"
    spark.sql(f"""
FROM nation
INSERT OVERWRITE DIRECTORY '{a}' USING parquet SELECT n_nationkey WHERE n_regionkey = 0
INSERT OVERWRITE DIRECTORY '{b}' USING parquet SELECT n_name WHERE n_regionkey = 1
""")
    assert spark.read.parquet(a).count() == 5
    assert spark.read.parquet(b).count() == 5
