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
    (
        "groupby_rollup1",  # groupby_rollup1.q
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
           FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    ),
    (
        "groupby_grouping_sets1",  # groupby_grouping_sets1.q + grouping marker
        """SELECT l_returnflag, l_linestatus,
                  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
                  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
                  COUNT(*) AS cnt
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    ),
    (
        "cross_join",  # cross_join.q
        """SELECT n_name, r_name FROM nation CROSS JOIN region
           WHERE n_nationkey < 3""",
    ),
    (
        "subquery_notin",  # subquery_notin.q (non-null inner side)
        """SELECT n_name FROM nation
           WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)""",
    ),
    (
        "subquery_scalar_select",  # subquery_scalar.q: scalar agg in projection
        """SELECT o_orderpriority,
                  COUNT(*) AS cnt,
                  (SELECT COUNT(*) FROM customer) AS n_cust
           FROM orders GROUP BY o_orderpriority""",
    ),
    (
        "cte_2",  # cte_2.q: CTE joined to base table
        """WITH big AS (SELECT o_custkey, COUNT(*) AS n FROM orders
                        GROUP BY o_custkey HAVING COUNT(*) > 30)
           SELECT c_mktsegment, COUNT(*) AS n_big
           FROM big JOIN customer ON c_custkey = o_custkey
           GROUP BY c_mktsegment""",
    ),
    (
        "multi_column_in",  # multi_column_in.q: row-constructor IN
        """SELECT COUNT(*) AS cnt FROM lineitem
           WHERE (l_returnflag, l_linestatus) IN (('A', 'F'), ('N', 'O'))""",
    ),
    (
        "groupby_position",  # groupby_position.q: ordinal group/order refs
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
           FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    (
        "udf_string_chain",  # udf_concat/substr/upper/trim family
        """SELECT p_partkey,
                  upper(substr(p_name, 1, 3)) AS pre,
                  concat(lower(p_brand), ':', p_type) AS tagged,
                  length(trim(p_name)) AS ln,
                  replace(p_name, ' ', '_') AS snake
           FROM part WHERE p_partkey % 97 = 11""",
    ),
    (
        "udf_floor_ceil_abs",  # udf_floor.q / udf_ceil.q / udf_abs.q
        """SELECT l_linenumber,
                  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS k_floor,
                  CAST(ceil(l_discount * 100) AS BIGINT) AS pct_ceil,
                  abs(l_linenumber - 4) AS dist
           FROM lineitem WHERE l_orderkey % 503 = 7""",
    ),
    (
        "date_extract",  # date_udf.q / extract family
        """SELECT extract(year FROM o_orderdate) AS y,
                  extract(month FROM o_orderdate) AS m,
                  COUNT(*) AS cnt
           FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    (
        "date_trunc_month",  # timestamp family: month bucketing
        """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mth, COUNT(*) AS cnt
           FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
           GROUP BY 1 ORDER BY 1""",
    ),
    (
        "between_in_filter",  # vector_between_in.q
        """SELECT COUNT(*) AS cnt FROM orders
           WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                 AND TIMESTAMP '1996-12-31 23:59:59'
             AND o_orderpriority IN ('1-URGENT', '5-LOW')""",
    ),
    (
        "join_reorder",  # join_reorder.q: chain with selective ends
        """SELECT r_name, COUNT(*) AS cnt
           FROM region JOIN nation ON r_regionkey = n_regionkey
           JOIN supplier ON n_nationkey = s_nationkey
           WHERE s_acctbal > 9000 GROUP BY r_name""",
    ),
    (
        "self_join",  # self-join family (join38.q etc.)
        """SELECT a.n_name AS n1, b.n_name AS n2
           FROM nation a JOIN nation b
             ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name""",
    ),
    (
        "count_nulls",  # count.q: COUNT(col) null-skipping vs COUNT(*)
        """SELECT COUNT(*) AS n_all,
                  COUNT(NULLIF(o_orderstatus, 'O')) AS n_not_open
           FROM orders""",
    ),
    (
        "order_multi_key",  # order2.q: mixed asc/desc
        """SELECT c_custkey, c_acctbal FROM customer
           WHERE c_custkey % 157 = 3
           ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey""",
    ),
    (
        "distinct_project",  # distinct family
        """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders""",
    ),
    (
        "intersect_except",  # intersect_all.q / except_distinct.q
        """SELECT c_nationkey AS k FROM customer
           INTERSECT
           SELECT s_nationkey FROM supplier
           EXCEPT
           SELECT n_nationkey FROM nation WHERE n_regionkey = 4""",
    ),
    (
        "scalar_arithmetic_where",  # subquery family: scalar in WHERE arithmetic
        """SELECT s_suppkey, s_acctbal FROM supplier
           WHERE s_acctbal > (SELECT MAX(s_acctbal) FROM supplier) * 0.9""",
    ),
    (
        "case_sensitivity",  # case_sensitivity.q: upper-case identifiers resolve
        """SELECT N_NAME AS n_name, R_NAME AS r_name
           FROM NATION JOIN REGION ON N_REGIONKEY = R_REGIONKEY
           WHERE N_NATIONKEY = 0""",
    ),
    (
        "join_filters",  # join_filters.q: ON-clause filter on outer join (kept) vs WHERE (dropped rows)
        """SELECT n_name, r_name FROM nation
           LEFT JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'""",
    ),
    (
        "join_nulls",  # join_nulls.q: NULL keys never match in equi-joins
        """SELECT COUNT(*) AS cnt
           FROM (SELECT NULLIF(n_regionkey, 0) AS k FROM nation) a
           JOIN region ON a.k = r_regionkey""",
    ),
    (
        "join38",  # join38.q: 3-table chain with mixed join predicates
        """SELECT c_name, o_orderkey, n_name
           FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN nation ON c_nationkey = n_nationkey
           WHERE o_totalprice > 450000 AND n_regionkey < 2""",
    ),
    (
        "union_remove_1",  # union_remove_1.q: agg over a union of aggs
        """SELECT k, SUM(cnt) AS total FROM (
             SELECT o_orderstatus AS k, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus
             UNION ALL
             SELECT l_returnflag AS k, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag
           ) u GROUP BY k""",
    ),
    (
        "nullgroup",  # nullgroup.q: global aggregate over an empty input still yields one row
        """SELECT COUNT(*) AS cnt, COUNT(o_custkey) AS cnt_col
           FROM orders WHERE o_totalprice < 0""",
    ),
    (
        "count",  # count.q: count(*) vs count(col) vs count(distinct) under NULLs
        """SELECT COUNT(*) AS n_all,
                  COUNT(NULLIF(o_orderstatus, 'O')) AS n_not_open,
                  COUNT(DISTINCT NULLIF(o_orderstatus, 'O')) AS n_distinct
           FROM orders""",
    ),
    (
        "decimal_precision",  # decimal_precision.q: exact decimal agg (order-independent at any parallelism)
        """SELECT l_returnflag,
                  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price,
                  SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
           FROM lineitem GROUP BY l_returnflag""",
    ),
    (
        "vector_between_in",  # vector_between_in.q: BETWEEN + IN over dates and numbers
        """SELECT COUNT(*) AS cnt FROM lineitem
           WHERE l_quantity BETWEEN 10 AND 20
             AND l_shipdate BETWEEN '1996-01-01' AND '1996-12-31'
             AND l_returnflag IN ('A', 'N')""",
    ),
    (
        "timestamp_arithmetic",  # timestamp-interval arithmetic (date_add family)
        """SELECT o_orderkey,
                  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
           FROM orders WHERE o_orderkey % 1009 = 17""",
    ),
    (
        "ppd_gby",  # ppd_gby.q: predicate pushed through a group-by subquery
        """SELECT k, n FROM (
             SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY o_custkey
           ) t WHERE k < 100""",
    ),
    (
        "correlationoptimizer1",  # correlationoptimizer1.q: join + agg sharing the same key
        """SELECT o_custkey, COUNT(*) AS n_items
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           WHERE o_custkey % 211 = 3
           GROUP BY o_custkey""",
    ),
    (
        "subquery_notin_having",  # subquery_notin_having.q: NOT IN subquery inside HAVING
        """SELECT c_nationkey, COUNT(*) AS n FROM customer
           GROUP BY c_nationkey
           HAVING c_nationkey NOT IN
             (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)""",
    ),
    (
        "udf_greatest_least",  # udf_greatest.q / udf_least.q
        """SELECT p_partkey,
                  GREATEST(p_size, 25, CAST(p_partkey % 50 AS INT)) AS g,
                  LEAST(p_size, 25, CAST(p_partkey % 50 AS INT)) AS l
           FROM part WHERE p_partkey % 101 = 7""",
    ),
    (
        "udf_case_nested",  # udf_case.q: nested searched CASE
        """SELECT o_orderkey,
                  CASE WHEN o_totalprice > 400000 THEN
                         CASE WHEN o_orderstatus = 'F' THEN 'big-final' ELSE 'big-open' END
                       WHEN o_totalprice > 200000 THEN 'mid'
                       ELSE 'small' END AS bucket
           FROM orders WHERE o_orderkey % 997 = 13""",
    ),
    (
        "windowing_expressions",  # windowing_expressions.q: window agg inside an expression
        """SELECT l_orderkey, l_linenumber,
                  CAST(l_extendedprice AS DOUBLE)
                    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                             OVER (PARTITION BY l_orderkey) AS DOUBLE) AS price_share
           FROM lineitem WHERE l_orderkey % 1499 = 11""",
    ),
    (
        "limit_subquery",  # limit_pushdown.q: LIMIT inside a derived table (count is stable)
        """SELECT COUNT(*) AS cnt FROM
           (SELECT l_orderkey FROM lineitem LIMIT 100) t""",
    ),
    (
        "scalar_subquery_expr",  # subquery_exists.q-era scalar in SELECT list
        """SELECT o_orderkey,
                  CAST(o_totalprice AS DECIMAL(18,2))
                    - (SELECT CAST(MIN(o_totalprice) AS DECIMAL(18,2)) FROM orders) AS over_min
           FROM orders WHERE o_orderkey % 1013 = 5""",
    ),
    (
        "groupby_grouping_id2",  # groupby_grouping_id2.q: GROUPING() disambiguates NULL key vs rollup row
        """SELECT o_orderstatus, GROUPING(o_orderstatus) AS g, COUNT(*) AS cnt
           FROM orders GROUP BY ROLLUP(o_orderstatus)""",
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
