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
           GROUP BY o_custkey HAVING COUNT(*) > (SELECT 1.5 * COUNT(*) / COUNT(DISTINCT o_custkey) FROM orders)""",
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
           WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9990)""",
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
                        GROUP BY o_custkey HAVING COUNT(*) > (SELECT 1.5 * COUNT(*) / COUNT(DISTINCT o_custkey) FROM orders))
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
           WHERE s_acctbal > (SELECT AVG(s_acctbal) FROM supplier) GROUP BY r_name""",
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
        "union_remove_agg_of_aggs",  # union_remove_1.q: agg over a union of aggs
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
    # Round-5 tranche: metadata/stats-era leftovers + filter/agg edge
    # families (VERDICT r4 "What's missing" #4).
    (
        "multi_distinct_empty_input",  # nullgroup4_multi_distinct.q: global multi-DISTINCT agg over zero matching rows -> one all-zero row
        """SELECT COUNT(1) AS c1, COUNT(DISTINCT n_name) AS c2,
                  COUNT(DISTINCT substr(n_name, 1, 2)) AS c3
           FROM nation WHERE n_nationkey = 9999""",
    ),
    (
        "ppd_reaggregate",  # ppd_gby2.q: outer WHERE mixes pushable and non-pushable conjuncts over a derived aggregate, then regroups
        """SELECT MAX(c1) AS m, c2 FROM (
             SELECT o_orderpriority AS c1, COUNT(o_orderkey) AS c2
             FROM orders WHERE o_orderpriority > '1' GROUP BY o_orderpriority
           ) t WHERE c1 > '2' AND (c2 > 30 OR c1 < '5')
           GROUP BY c2""",
    ),
    (
        "having_compound_aggregates",  # having2.q: three aggregate conditions ANDed in one HAVING
        """SELECT c_nationkey, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total,
                  COUNT(*) AS cnt
           FROM customer GROUP BY c_nationkey
           HAVING SUM(CAST(c_acctbal AS DECIMAL(18,2))) > 10000
              AND MIN(c_acctbal) < 0 AND MAX(c_acctbal) >= 9000""",
    ),
    (
        "join_filters_overlap",  # join_filters_overlap.q (HIVE-3411): chained LEFT OUTER self-joins whose ON clauses carry overlapping non-key filters on the SAME left alias
        """SELECT a.n_nationkey AS ak, b.n_nationkey AS bk, c.n_nationkey AS ck
           FROM nation a
           LEFT OUTER JOIN nation b
             ON (a.n_regionkey = b.n_regionkey AND a.n_nationkey = 5 AND b.n_nationkey = 5)
           LEFT OUTER JOIN nation c
             ON (a.n_regionkey = c.n_regionkey AND a.n_nationkey = 10 AND c.n_nationkey = 10)""",
    ),
    (
        "union_mixed_depth",  # union33.q: union of a map-only branch with a branch needing its own aggregation, consumed by an outer count
        """SELECT COUNT(*) AS n FROM (
             SELECT o_custkey AS k FROM orders WHERE o_custkey = 7
             UNION ALL
             SELECT o_custkey AS k FROM orders GROUP BY o_custkey
           ) u""",
    ),
    (
        "groupby_expr_key_multi_distinct",  # groupby_ppr.q: GROUP BY on an expression key with DISTINCT + concat(key, sum) output
        """SELECT substr(o_orderpriority, 1, 1) AS k,
                  COUNT(DISTINCT o_orderstatus) AS d,
                  concat(substr(o_orderpriority, 1, 1),
                         CAST(SUM(o_orderkey) AS STRING)) AS tagged
           FROM orders WHERE o_orderstatus = 'F'
           GROUP BY substr(o_orderpriority, 1, 1)""",
    ),
    (
        "date_comparison_battery",  # date_comparison.q: trichotomy of a date column against a literal plus min/max rendered as strings
        """SELECT CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) < DATE '1995-06-17' THEN 1 ELSE 0 END) AS BIGINT) AS lt,
                  CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) = DATE '1995-06-17' THEN 1 ELSE 0 END) AS BIGINT) AS eq,
                  CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) > DATE '1995-06-17' THEN 1 ELSE 0 END) AS BIGINT) AS gt,
                  CAST(MIN(CAST(l_shipdate AS DATE)) AS STRING) AS mn,
                  CAST(MAX(CAST(l_shipdate AS DATE)) AS STRING) AS mx
           FROM lineitem""",
    ),
    (
        "groupby_constant_key",  # groupby_neg_float.q: GROUP BY a negative float constant (one group)
        """SELECT CAST('-30.33' AS DOUBLE) AS k FROM nation
           GROUP BY CAST('-30.33' AS DOUBLE) LIMIT 1""",
    ),
    (
        "case_expr_group_key",  # udf_case_column_pruning.q: CASE WHEN as both projection and grouping key
        """SELECT CASE WHEN n_regionkey IN (0, 1) THEN 'west'
                       WHEN n_regionkey = 2 THEN 'asia' ELSE 'other' END AS zone,
                  COUNT(*) AS cnt
           FROM nation
           GROUP BY CASE WHEN n_regionkey IN (0, 1) THEN 'west'
                         WHEN n_regionkey = 2 THEN 'asia' ELSE 'other' END""",
    ),
    (
        "join_merging_same_key",  # join_merging.q: consecutive joins on one key collapse into a single co-partitioning
        """SELECT n_name, COUNT(*) AS pairs
           FROM supplier a JOIN supplier b ON a.s_nationkey = b.s_nationkey
           JOIN nation n ON a.s_nationkey = n_nationkey
           GROUP BY n_name""",
    ),
]

# Round-2 tranche: the next 50 clientpositive families (VERDICT r1
# "What's missing" #3) — join2-series, ppd*, union_remove*,
# groupby_grouping_sets*, portable udf* shapes. Same porting rules:
# driver fixtures, one dialect-portable SQL string for both engines,
# double sums routed through DECIMAL, every query non-empty at sf0.01.
QSCRIPTS_R2 = [
    # ---- join series ------------------------------------------------
    (
        "join2",  # join2.q: 3-way join, third ON key is an expression of the first two
        """SELECT n1.n_name, n3.n_name AS n3_name
           FROM nation n1 JOIN nation n2 ON n1.n_nationkey = n2.n_nationkey
           JOIN nation n3 ON n1.n_regionkey + n2.n_regionkey = n3.n_nationkey""",
    ),
    (
        "join3",  # join3.q: 3-way join all on the same key
        """SELECT s1.s_name, COUNT(*) AS n
           FROM supplier s1
           JOIN lineitem l ON s1.s_suppkey = l.l_suppkey
           JOIN supplier s2 ON l.l_suppkey = s2.s_suppkey
           WHERE s1.s_suppkey < 10
           GROUP BY s1.s_name""",
    ),
    (
        "join11",  # join11.q: subquery-aliased sides + inequality conjunct in ON
        """SELECT c.k1, o.total
           FROM (SELECT c_custkey AS k1, c_acctbal AS bal FROM customer) c
           JOIN (SELECT o_custkey AS k2, o_totalprice AS total FROM orders) o
             ON c.k1 = o.k2 AND c.k1 < 100""",
    ),
    (
        "join12",  # join12.q: 3 subquery sides, two bound keys, two filters
        """SELECT a.k1, b.bal2
           FROM (SELECT c_custkey AS k1 FROM customer) a
           JOIN (SELECT c_custkey AS k2, c_acctbal AS bal2 FROM customer) b
             ON a.k1 = b.k2 AND a.k1 < 150
           JOIN (SELECT c_custkey AS k3 FROM customer) c
             ON a.k1 = c.k3 AND c.k3 < 120""",
    ),
    (
        "join13",  # join13.q: third side joined on SUM of first two keys
        """SELECT a.k1, b.k2
           FROM (SELECT n_nationkey AS k1 FROM nation) a
           JOIN (SELECT n_nationkey AS k2 FROM nation) b
             ON a.k1 = b.k2 AND a.k1 < 20
           JOIN (SELECT n_nationkey AS k3 FROM nation) c
             ON a.k1 + b.k2 = c.k3 AND c.k3 < 22""",
    ),
    (
        "join15",  # join15.q: self-join, full projection, total order
        """SELECT n1.n_nationkey, n1.n_name, n2.n_nationkey AS k2, n2.n_regionkey AS r2
           FROM nation n1 JOIN nation n2 ON n1.n_nationkey = n2.n_nationkey
           ORDER BY n1.n_nationkey""",
    ),
    (
        "join16",  # join16.q: filter inside subquery + extra ON conjuncts + outer WHERE
        """SELECT subq.k, o.o_totalprice
           FROM (SELECT c_custkey AS k, c_nationkey FROM customer WHERE c_custkey > 10) subq
           JOIN orders o ON subq.k = o.o_custkey AND subq.k > 20
           WHERE o.o_totalprice < 5000""",
    ),
    (
        "join18",  # join18.q: FULL OUTER JOIN of two aggregates (count vs count distinct)
        """SELECT a.k, a.cnt, b.k AS kb, b.dcnt
           FROM (SELECT o_custkey AS k, COUNT(o_orderkey) AS cnt
                 FROM orders GROUP BY o_custkey) a
           FULL OUTER JOIN
                (SELECT c_nationkey AS k, COUNT(DISTINCT c_mktsegment) AS dcnt
                 FROM customer GROUP BY c_nationkey) b
             ON a.k = b.k""",
    ),
    (
        "join21",  # join21.q: LEFT OUTER then RIGHT OUTER chain with asymmetric ON filters
        """SELECT n1.n_nationkey, n2.n_nationkey AS k2, n3.n_nationkey AS k3
           FROM nation n1
           LEFT OUTER JOIN nation n2
             ON n1.n_nationkey = n2.n_nationkey AND n1.n_nationkey < 10 AND n2.n_nationkey > 10
           RIGHT OUTER JOIN nation n3
             ON n2.n_nationkey = n3.n_nationkey AND n3.n_nationkey < 10
           ORDER BY n1.n_nationkey, k2, k3""",
    ),
    (
        "join38_computed_key",  # join38.q: join on a computed/renamed column + WHERE equality + group
        """SELECT a.r_name, COUNT(*) AS cnt
           FROM region a
           JOIN (SELECT n_nationkey, n_regionkey + 0 AS col11 FROM nation) b
             ON a.r_regionkey = b.col11
           WHERE b.col11 = 2
           GROUP BY a.r_name""",
    ),
    (
        "auto_join0",  # auto_join0.q: bounded cartesian aggregated to one row
        """SELECT CAST(SUM(CAST(a.n_nationkey + b.n_nationkey AS BIGINT)) AS BIGINT) AS s
           FROM (SELECT n_nationkey FROM nation WHERE n_nationkey < 5) a
           CROSS JOIN (SELECT n_nationkey FROM nation WHERE n_nationkey < 5) b""",
    ),
    (
        "join_nulls_producing_keys",  # join_nulls.q: NULL-producing join keys never match
        """SELECT COUNT(*) AS n
           FROM (SELECT CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_nationkey END AS k
                 FROM customer) a
           JOIN (SELECT n_nationkey AS k FROM nation) b ON a.k = b.k""",
    ),
    (
        "join_filters_on_side_kept",  # join_filters.q: outer join keeps unmatched left under ON-side filters
        """SELECT p.p_partkey, l.l_orderkey
           FROM part p
           LEFT OUTER JOIN lineitem l
             ON p.p_partkey = l.l_partkey AND l.l_quantity > 49 AND p.p_size < 10
           WHERE p.p_partkey % 50 = 3""",
    ),
    (
        "join_reorder2",  # join_reorder2.q: 4-table chain with mixed join keys
        """SELECT r_name, n_name, COUNT(DISTINCT c_custkey) AS n_cust,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
           FROM region
           JOIN nation ON n_regionkey = r_regionkey
           JOIN customer ON c_nationkey = n_nationkey
           JOIN orders ON o_custkey = c_custkey
           WHERE r_regionkey < 2
           GROUP BY r_name, n_name""",
    ),
    (
        "join_view",  # join_view.q shape: join through an inline view with aggregation
        """SELECT v.seg, v.n_orders, r.r_name
           FROM (SELECT c_mktsegment AS seg, c_nationkey AS nk, COUNT(o_orderkey) AS n_orders
                 FROM customer JOIN orders ON o_custkey = c_custkey
                 GROUP BY c_mktsegment, c_nationkey) v
           JOIN nation n ON v.nk = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE v.n_orders > 20""",
    ),
    # ---- predicate pushdown (ppd*) ---------------------------------
    (
        "ppd_join",  # ppd_join.q: filters inside both subqueries, ON inequality, OR-laced WHERE
        """SELECT s1.c1, s2.c4
           FROM (SELECT o_orderkey AS c1, o_totalprice AS c2 FROM orders WHERE o_orderkey > 100) s1
           JOIN (SELECT l_orderkey AS c3, l_extendedprice AS c4 FROM lineitem WHERE l_orderkey > 20) s2
             ON s1.c1 = s2.c3 AND s1.c1 < 4000000
           WHERE s1.c1 > 200 AND (s1.c2 < 50000 OR s1.c1 > 300)
             AND (s2.c3 > 500 OR s1.c1 < 5000000) AND s2.c3 <> 4""",
    ),
    (
        "ppd_gby_above",  # ppd_gby.q: predicate above a group-by subquery mixing agg and key
        """SELECT s1.c1
           FROM (SELECT c_mktsegment AS c1, COUNT(c_custkey) AS c2
                 FROM customer WHERE c_mktsegment > 'AUTO' GROUP BY c_mktsegment) s1
           WHERE s1.c1 > 'B' AND (s1.c2 > 30 OR s1.c1 < 'M')""",
    ),
    (
        "ppd_outer_join1",  # ppd_outer_join1.q: WHERE on both sides collapses LEFT OUTER to inner
        """SELECT a.n_nationkey, a.n_name, b.s_suppkey, b.s_name
           FROM nation a LEFT OUTER JOIN supplier b ON a.n_nationkey = b.s_nationkey
           WHERE a.n_nationkey > 2 AND a.n_nationkey < 20
             AND b.s_suppkey >= 0 AND b.s_suppkey < 60""",
    ),
    (
        "ppd_outer_join2",  # ppd_outer_join2.q: RIGHT OUTER, WHERE restricted to preserved side
        """SELECT a.s_suppkey, b.n_nationkey, b.n_name
           FROM supplier a RIGHT OUTER JOIN nation b ON a.s_nationkey = b.n_nationkey
           WHERE b.n_nationkey > 5 AND b.n_nationkey < 15""",
    ),
    (
        "ppd_union",  # ppd_union.q: outer WHERE pushed into both union branches
        """SELECT u.o_orderkey, u.o_totalprice
           FROM (
             SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 10000
             UNION ALL
             SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000
           ) u
           WHERE u.o_orderkey % 7 = 0 AND u.o_totalprice > 2000""",
    ),
    (
        "ppd_distinct",  # ppd family: predicate above DISTINCT subquery
        """SELECT d.l_returnflag, d.l_linestatus
           FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) d
           WHERE d.l_returnflag <> 'N'""",
    ),
    (
        "ppd_multi_where",  # ppd2.q shape: stacked subqueries each adding a filter
        """SELECT k, bal FROM (
             SELECT k, bal FROM (
               SELECT c_custkey AS k, c_acctbal AS bal FROM customer WHERE c_acctbal > 0
             ) x WHERE k % 2 = 0
           ) y WHERE bal < 9000""",
    ),
    # ---- union_remove / union family -------------------------------
    (
        "union_remove_6",  # union_remove_6.q: UNION ALL of two identical aggs, agg above
        """SELECT key, CAST(SUM(vals) AS BIGINT) AS total FROM (
             SELECT o_orderstatus AS key, COUNT(1) AS vals FROM orders GROUP BY o_orderstatus
             UNION ALL
             SELECT o_orderstatus AS key, COUNT(1) AS vals FROM orders GROUP BY o_orderstatus
           ) a GROUP BY key""",
    ),
    (
        "union_remove_12",  # union_remove_12.q: plain branch UNION ALL join branch
        """SELECT key, CAST(SUM(v) AS BIGINT) AS total FROM (
             SELECT n_name AS key, 1 AS v FROM nation
             UNION ALL
             SELECT a.n_name AS key, b.n_regionkey AS v
             FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey
           ) c GROUP BY key""",
    ),
    (
        "union3",  # union3-ish: three heterogeneous branches, distinct above
        """SELECT DISTINCT src, k FROM (
             SELECT 'r' AS src, r_regionkey AS k FROM region
             UNION ALL
             SELECT 'n' AS src, n_regionkey AS k FROM nation
             UNION ALL
             SELECT 'c' AS src, c_nationkey % 5 AS k FROM customer
           ) u""",
    ),
    (
        "union_distinct_overlap",  # union.q: UNION (distinct) dedups overlapping ranges
        """SELECT o_orderkey FROM orders WHERE o_orderkey BETWEEN 100 AND 300
           UNION
           SELECT o_orderkey FROM orders WHERE o_orderkey BETWEEN 200 AND 400""",
    ),
    (
        "union_agg_branches",  # union with differing agg in each branch
        """SELECT src, CAST(val AS DOUBLE) AS val FROM (
             SELECT 'max_bal' AS src, MAX(c_acctbal) AS val FROM customer
             UNION ALL
             SELECT 'min_bal' AS src, MIN(c_acctbal) AS val FROM customer
             UNION ALL
             SELECT 'n_cust' AS src, COUNT(*) AS val FROM customer
           ) u""",
    ),
    # ---- grouping sets family --------------------------------------
    (
        "groupby_grouping_sets_mixed",  # groupby_grouping_sets1.q: explicit mixed sets
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())""",
    ),
    (
        "groupby_grouping_sets2",  # groupby_grouping_sets2.q: cube over expression sum
        """SELECT l_returnflag, l_linestatus,
                  CAST(SUM(CAST(l_quantity + l_linenumber AS DECIMAL(38,2))) AS DOUBLE) AS s
           FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    ),
    (
        "groupby_grouping_sets4",  # groupby_grouping_sets4.q: join of two cube subqueries
        """SELECT s1.st, s1.cnt, s2.cnt AS cnt2
           FROM (SELECT o_orderstatus AS st, COUNT(*) AS cnt FROM orders
                 WHERE o_orderkey < 5000 GROUP BY CUBE(o_orderstatus)) s1
           JOIN (SELECT o_orderstatus AS st, COUNT(*) AS cnt FROM orders
                 WHERE o_orderkey < 5000 GROUP BY CUBE(o_orderstatus)) s2
             ON s1.st = s2.st""",
    ),
    (
        "groupby_grouping_sets5",  # groupby_grouping_sets5.q: grouping sets over a join
        """SELECT r_name, n_name, COUNT(*) AS cnt
           FROM nation JOIN region ON n_regionkey = r_regionkey
           GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())""",
    ),
    (
        "groupby_grouping_window",  # groupby_grouping_window.q: window over grouping-set output
        """SELECT st, prio, cnt,
                  RANK() OVER (PARTITION BY st ORDER BY cnt DESC, prio) AS rk
           FROM (SELECT o_orderstatus AS st, o_orderpriority AS prio, COUNT(*) AS cnt
                 FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)) g
           WHERE st IS NOT NULL""",
    ),
    (
        "groupby_grouping_id_all",  # grouping_id over 3 keys: every aggregation level tagged
        """SELECT l_returnflag, l_linestatus,
                  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
                  COUNT(*) AS cnt
           FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    ),
    # ---- groupby family --------------------------------------------
    (
        "groupby_expression_key",  # groupby_expr.q: grouping on computed expressions
        """SELECT CAST(YEAR(o_orderdate) AS INT) AS yr, o_orderstatus, COUNT(*) AS cnt
           FROM orders GROUP BY CAST(YEAR(o_orderdate) AS INT), o_orderstatus""",
    ),
    (
        "groupby_position_orderby",  # groupby_position.q: ordinal GROUP BY / ORDER BY
        """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
           FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    (
        "groupby_distinct_samekey",  # count(distinct) + plain agg on one key
        """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS qty
           FROM lineitem GROUP BY l_returnflag""",
    ),
    (
        "groupby_multi_distinct",  # join18_multi_distinct.q: several DISTINCT aggs together
        """SELECT o_orderstatus,
                  COUNT(DISTINCT o_custkey) AS d_cust,
                  COUNT(DISTINCT o_orderpriority) AS d_prio,
                  COUNT(*) AS n
           FROM orders GROUP BY o_orderstatus""",
    ),
    (
        "groupby_having_compound",  # having.q variants: HAVING mixes selected and unselected aggs
        """SELECT c_nationkey, COUNT(*) AS n
           FROM customer GROUP BY c_nationkey
           HAVING COUNT(*) > 3 AND MAX(c_acctbal) > 5000""",
    ),
    (
        "groupby_sort_agg_desc",  # groupby_sort_1.q: full deterministic order on agg output
        """SELECT c_mktsegment, COUNT(*) AS n
           FROM customer GROUP BY c_mktsegment
           ORDER BY n DESC, c_mktsegment""",
    ),
    (
        "groupby_date_trunc",  # groupby_ppr-ish: time-bucketed aggregation on events
        """SELECT CAST(DATE_TRUNC('month', ts) AS DATE) AS mo, event_type, COUNT(*) AS n
           FROM events GROUP BY 1, 2""",
    ),
    # ---- portable UDF family ---------------------------------------
    (
        "udf_case_fallthrough",  # udf_case.q: nested CASE with fallthrough
        """SELECT o_orderkey,
                  CASE WHEN o_totalprice > 300000 THEN 'high'
                       WHEN o_totalprice > 100000 THEN
                         CASE WHEN o_orderstatus = 'F' THEN 'mid_final' ELSE 'mid_open' END
                       ELSE 'low' END AS bucket
           FROM orders WHERE o_orderkey % 211 = 0""",
    ),
    (
        "udf_coalesce_nullif",  # udf_coalesce.q: COALESCE/NULLIF interplay
        """SELECT n_nationkey,
                  COALESCE(NULLIF(n_name, 'NATION_3'), 'masked') AS masked_name,
                  COALESCE(NULL, NULL, n_regionkey, 99) AS first_nonnull
           FROM nation""",
    ),
    (
        "udf_string_suite2",  # udf_substr/concat/lpad family
        """SELECT c_custkey,
                  SUBSTR(c_name, 1, 8) AS pre,
                  CONCAT(UPPER(c_mktsegment), '_', LOWER(c_name)) AS tagged,
                  LENGTH(c_name) AS len,
                  REPLACE(c_name, 'Customer', 'C') AS short_name,
                  LPAD(CAST(c_custkey AS VARCHAR(12)), 8, '0') AS padded
           FROM customer WHERE c_custkey % 97 = 0""",
    ),
    (
        "udf_math_suite2",  # udf_round/floor/abs/mod family (BIGINT casts per parity rules)
        """SELECT l_orderkey, l_linenumber,
                  ROUND(l_extendedprice, 1) AS r1,
                  CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
                  CAST(CEIL(l_discount * 100) AS BIGINT) AS ce,
                  ABS(l_linenumber - 4) AS ab,
                  MOD(l_orderkey, 7) AS m7
           FROM lineitem WHERE l_orderkey % 503 = 1""",
    ),
    (
        "udf_instr_trim",  # udf_instr.q / udf_trim.q
        """SELECT p_partkey,
                  INSTR(p_name, 'widget') AS pos_widget,
                  TRIM('  ' || p_name || ' ') AS trimmed,
                  RTRIM('  ' || p_name || '  ') AS right_trimmed
           FROM part WHERE p_partkey % 151 = 0""",
    ),
    (
        "udf_like_family",  # udf_like.q: LIKE / NOT LIKE / escaped pattern
        """SELECT p_partkey, p_name
           FROM part
           WHERE p_name LIKE '%widget%' AND p_name NOT LIKE 'small%'
             AND p_brand LIKE 'Brand#1_'""",
    ),
    (
        "udf_between_dates",  # udf_between.q on the date column
        """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
           FROM orders
           WHERE o_orderdate BETWEEN DATE '1996-03-01' AND DATE '1996-03-15'
             AND o_orderkey % 3 = 0""",
    ),
    (
        "udf_in_row_constructor",  # row-constructor IN (portable per parity rules)
        """SELECT l_orderkey, l_linenumber
           FROM lineitem
           WHERE (l_returnflag, l_linestatus) IN (('A','F'), ('R','F'))
             AND l_orderkey % 397 = 0""",
    ),
    # ---- semijoin / correlation odds and ends ----------------------
    (
        "semijoin_multikey",  # semijoin4.q: two-column correlation (EXISTS spelling —
        # DuckDB doesn't bind multi-column IN subqueries)
        """SELECT o_orderkey FROM orders o
           WHERE EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey AND c.c_acctbal < 0
                           AND o.o_orderstatus = 'F')
             AND o_orderkey % 5 = 0""",
    ),
    (
        "scalar_subquery_select_list",  # subquery_scalar.q: uncorrelated scalar in projection
        """SELECT n_name,
                  (SELECT COUNT(*) FROM region) AS n_regions,
                  (SELECT MAX(s_acctbal) FROM supplier) AS best_bal
           FROM nation WHERE n_regionkey = 0""",
    ),
    (
        "cte_chain2",  # cte_2.q: CTE referencing CTE with join at the end
        """WITH big_orders AS (
             SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 350000
           ),
           big_custs AS (
             SELECT o_custkey, COUNT(*) AS n_big FROM big_orders GROUP BY o_custkey
           )
           SELECT c.c_name, b.n_big
           FROM big_custs b JOIN customer c ON c.c_custkey = b.o_custkey
           WHERE b.n_big >= 2""",
    ),
    (
        "order_by_expression",  # order_by expression + null handling
        """SELECT s_suppkey, s_acctbal,
                  CASE WHEN s_acctbal < 0 THEN NULL ELSE ROUND(s_acctbal, 0) END AS pos_bal
           FROM supplier
           ORDER BY pos_bal NULLS FIRST, s_suppkey""",
    ),
]

# Round-2 tranche 3: windowing_* specs, decimal/timestamp value
# semantics, cbo_subq_* variants, correlationoptimizer shapes,
# count.q multi-distinct, nullgroup empty-input aggregates.
QSCRIPTS_R3 = [
    # ---- windowing family ------------------------------------------
    (
        "windowing_navfn",  # windowing_navfn.q: lead/lag with offsets and defaults
        """SELECT s_suppkey,
                  LEAD(s_acctbal, 1) OVER (ORDER BY s_suppkey) AS next_bal,
                  LAG(s_acctbal, 2) OVER (ORDER BY s_suppkey)  AS prev2_bal,
                  LEAD(s_acctbal, 1, -1.0) OVER (ORDER BY s_suppkey) AS next_bal_dflt,
                  FIRST_VALUE(s_acctbal) OVER (ORDER BY s_suppkey) AS first_bal
           FROM supplier ORDER BY s_suppkey""",
    ),
    (
        "windowing_ntile",  # windowing_ntile.q: ntile + percent_rank together
        """SELECT c_custkey,
                  NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile,
                  CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS cd
           FROM customer WHERE c_custkey % 31 = 0
           ORDER BY c_custkey""",
    ),
    (
        "windowing_windowspec_rows",  # windowing_windowspec.q: explicit ROWS frames
        """SELECT l_orderkey, l_linenumber,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2)))
                    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS neighborhood_qty,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2)))
                    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
           FROM lineitem WHERE l_orderkey % 251 = 0
           ORDER BY l_orderkey, l_linenumber""",
    ),
    (
        "windowing_range_frame",  # RANGE value frame on a numeric order key
        """SELECT p_partkey, p_size,
                  COUNT(*) OVER (ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_similar
           FROM part WHERE p_partkey % 101 = 0
           ORDER BY p_partkey""",
    ),
    (
        "windowing_multiorder",  # windowing_range_multiorder.q: multi-col ORDER (unbounded frame)
        """SELECT o_custkey, o_orderkey,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey) AS rn,
                  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey
                                               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
           FROM orders WHERE o_custkey % 211 = 7
           ORDER BY o_custkey, rn""",
    ),
    (
        "windowing_agg_and_groupby",  # windowing after aggregation (PTF over GBY output)
        """SELECT seg, yr, n,
                  RANK() OVER (PARTITION BY yr ORDER BY n DESC, seg) AS seg_rank
           FROM (SELECT c_mktsegment AS seg, extract(year FROM o_orderdate) AS yr, COUNT(*) AS n
                 FROM orders JOIN customer ON c_custkey = o_custkey
                 GROUP BY 1, 2) g
           ORDER BY yr, seg_rank""",
    ),
    # ---- decimal / numeric semantics --------------------------------
    (
        "decimal_precision_arith",  # decimal_precision.q: +- keeps scale, * sums scales
        """SELECT l_linenumber,
                  CAST(l_quantity AS DECIMAL(20,10)) + 1 AS plus_one,
                  CAST(l_quantity AS DECIMAL(20,10)) - 1 AS minus_one,
                  CAST(CAST(l_quantity AS DECIMAL(10,2)) * CAST(l_discount AS DECIMAL(5,2)) AS DECIMAL(16,4)) AS qd
           FROM lineitem WHERE l_orderkey % 811 = 1
           ORDER BY l_linenumber, plus_one""",
    ),
    (
        "decimal_agg_exact",  # decimal_udf.q family: exact decimal aggregation
        """SELECT l_returnflag,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS sum_price,
                  CAST(MIN(CAST(l_extendedprice AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS min_price,
                  CAST(MAX(CAST(l_extendedprice AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS max_price
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ),
    (
        "cast_string_numeric",  # cast family: string->numeric->string round trips
        """SELECT n_nationkey,
                  CAST(CAST(n_nationkey AS VARCHAR(10)) AS INT) AS round_trip,
                  CAST(n_nationkey AS DOUBLE) / 2 AS halved,
                  CAST(CAST('3.25' AS DOUBLE) AS INT) AS truncated
           FROM nation ORDER BY n_nationkey""",
    ),
    # ---- timestamp semantics ---------------------------------------
    (
        "timestamp_comparison",  # timestamp_comparison.q
        """SELECT COUNT(*) AS n_before,
                  CAST(SUM(CASE WHEN o_orderdate = TIMESTAMP '1995-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
           FROM orders
           WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'""",
    ),
    (
        "timestamp_parts",  # udf_hour/minute/day family over the events clock
        """SELECT extract(year FROM ts) AS y, extract(month FROM ts) AS mo,
                  extract(day FROM ts) AS d, extract(hour FROM ts) AS h,
                  COUNT(*) AS n
           FROM events GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""",
    ),
    (
        "date_arithmetic",  # date_add/diff family (portable spelling: +/- INTERVAL)
        """SELECT o_orderkey,
                  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
                  CAST(o_orderdate - INTERVAL 1 DAY AS DATE) AS day_before
           FROM orders WHERE o_orderkey % 1013 = 11
           ORDER BY o_orderkey""",
    ),
    # ---- cbo_subq family -------------------------------------------
    (
        "cbo_subq_in_distinct",  # cbo_subq_in.q: IN over SELECT DISTINCT
        """SELECT c_custkey FROM customer b
           WHERE b.c_custkey IN
                 (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 450000)
           ORDER BY c_custkey""",
    ),
    (
        "cbo_subq_not_in_having",  # cbo_subq_notin.q: NOT IN fed by a HAVING subquery
        """SELECT s_suppkey, s_name FROM supplier
           WHERE s_nationkey NOT IN
                 (SELECT n_nationkey FROM nation JOIN customer ON c_nationkey = n_nationkey
                  GROUP BY n_nationkey
                  HAVING COUNT(*) > (SELECT COUNT(*) FROM customer) / 20)
           ORDER BY s_suppkey""",
    ),
    (
        "cbo_subq_exists_agg",  # cbo_subq_exists.q: EXISTS over aggregated correlation
        """SELECT p_partkey, p_name FROM part p
           WHERE EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_partkey = p.p_partkey
                         GROUP BY l.l_partkey HAVING COUNT(*) > 45)
           ORDER BY p_partkey""",
    ),
    (
        "cbo_semijoin_agg_above",  # cbo join+agg composition
        """SELECT n_name, COUNT(*) AS n_supp
           FROM nation JOIN supplier ON s_nationkey = n_nationkey
           WHERE n_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)
           GROUP BY n_name ORDER BY n_name""",
    ),
    # ---- correlation optimizer shapes ------------------------------
    (
        "correlationoptimizer1_agg_above_join",  # correlationoptimizer1.q: agg above join sharing the join key
        """SELECT CAST(SUM(tmp.cnt) AS BIGINT) AS total_pairs, COUNT(*) AS n_keys
           FROM (SELECT o.o_custkey AS key, COUNT(1) AS cnt
                 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                 GROUP BY o.o_custkey) tmp""",
    ),
    (
        "correlationoptimizer_double_gby",  # two aggregations sharing one shuffle key
        """SELECT a.o_custkey, a.n_orders, b.total
           FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) a
           JOIN (SELECT o_custkey,
                        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
                 FROM orders GROUP BY o_custkey) b
             ON a.o_custkey = b.o_custkey
           WHERE a.n_orders > 8
           ORDER BY a.o_custkey""",
    ),
    # ---- count.q / nullgroup family --------------------------------
    (
        "count_multi_distinct_tuple",  # count.q: multi-arg distinct via portable key concat
        """SELECT l_returnflag,
                  COUNT(1) AS n1, COUNT(*) AS nstar,
                  COUNT(DISTINCT l_suppkey) AS d_supp,
                  COUNT(DISTINCT l_partkey) AS d_part,
                  COUNT(DISTINCT CAST(l_suppkey AS VARCHAR(20)) || '|' || CAST(l_partkey AS VARCHAR(20))) AS d_pair
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ),
    (
        "nullgroup_count_empty",  # nullgroup.q: COUNT over zero matching rows = one row of 0
        """SELECT COUNT(1) AS n FROM orders WHERE o_orderkey < 0""",
    ),
    (
        "nullgroup_sum_empty",  # nullgroup2.q: SUM/MIN/MAX over empty input are NULL
        """SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS s,
                  MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx, COUNT(*) AS n
           FROM orders WHERE o_orderkey < 0""",
    ),
    (
        "nullgroup_groupby_empty",  # nullgroup3.q: GROUP BY over empty input = zero rows...
        # guarded non-empty by unioning a sentinel branch
        """SELECT src, COUNT(*) AS n FROM (
             SELECT 'none' AS src FROM orders WHERE o_orderkey < 0
             UNION ALL
             SELECT 'sentinel' AS src FROM region
           ) u GROUP BY src""",
    ),
    (
        "groupby_null_keys",  # nullgroup5.q: NULL is a real grouping key
        """SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS k,
                  COUNT(*) AS n
           FROM orders GROUP BY 1 ORDER BY k NULLS FIRST""",
    ),
    # ---- misc classic shapes ---------------------------------------
    (
        "join_star_schema",  # star_join.q / cbo_join: fact + 3 dims
        """SELECT r_name, p_type, COUNT(*) AS n_lines
           FROM lineitem
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation   ON n_nationkey = s_nationkey
           JOIN region   ON r_regionkey = n_regionkey
           JOIN part     ON p_partkey = l_partkey
           WHERE p_size < 10
           GROUP BY r_name, p_type ORDER BY r_name, p_type""",
    ),
    (
        "self_join_inequality",  # theta self-join (nation is constant-size at every SF)
        """SELECT a.n_nationkey AS k1, b.n_nationkey AS k2
           FROM nation a JOIN nation b
             ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
           ORDER BY k1, k2""",
    ),
    (
        "case_with_agg",  # conditional aggregation (pivot-style)
        """SELECT o_orderpriority,
                  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
                  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
                  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
           FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    ),
    (
        "distinct_star_subset",  # distinct over projected subset with filter
        """SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
           FROM lineitem WHERE l_orderkey % 1511 = 9""",
    ),
    (
        "intersect_except_chain",  # setop chain with precedence
        """SELECT o_custkey FROM orders WHERE o_totalprice > 300000
           INTERSECT
           SELECT c_custkey FROM customer WHERE c_acctbal > 0
           EXCEPT
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""",
    ),
    (
        "having_on_distinct_agg",  # having.q variant gating on COUNT(DISTINCT)
        """SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS d_prio
           FROM orders GROUP BY o_custkey
           HAVING COUNT(DISTINCT o_orderpriority) >= 5
           ORDER BY o_custkey""",
    ),
    (
        "union_all_type_widening",  # union type resolution: INT branch + DOUBLE branch
        """SELECT CAST(SUM(v) AS DOUBLE) AS total FROM (
             SELECT CAST(n_nationkey AS DOUBLE) AS v FROM nation
             UNION ALL
             SELECT c_acctbal AS v FROM customer WHERE c_custkey % 100 = 0
           ) u""",
    ),
]

# Round-2 tranche 4: skew/mapjoin patterns, FROM-first grammar,
# FILTER clauses, setop ALL variants, scalar-subquery comparisons,
# portable function parity (regexp_extract, greatest/least, bool
# aggregates, LIKE ESCAPE, LIMIT/OFFSET, JOIN USING).
QSCRIPTS_R4 = [
    (
        "skewjoin_collapsed_key",  # skewjoin.q shape: CASE collapses keys into a heavy hitter
        """SELECT k, COUNT(*) AS n
           FROM (SELECT CASE WHEN o_custkey % 10 < 7 THEN 0 ELSE o_custkey END AS k
                 FROM orders) s
           JOIN (SELECT CASE WHEN c_custkey % 10 < 7 THEN 0 ELSE c_custkey END AS k
                 FROM customer WHERE c_custkey < 100) c USING (k)
           GROUP BY k ORDER BY n DESC, k LIMIT 10""",
    ),
    (
        "mapjoin_subquery",  # mapjoin_subquery.q: broadcast-sized subquery side
        """SELECT big.o_orderpriority, COUNT(*) AS n
           FROM orders big
           JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500) small
             ON big.o_custkey = small.c_custkey
           GROUP BY big.o_orderpriority ORDER BY big.o_orderpriority""",
    ),
    (
        "from_first_select",  # Hive FROM-first grammar (HiveParser.g body) — DuckDB shares it
        """FROM nation SELECT n_name, n_regionkey WHERE n_regionkey = 3""",
    ),
    (
        "agg_filter_clause",  # SQL:2003 FILTER clause on aggregates
        """SELECT o_orderpriority,
                  COUNT(*) AS n_all,
                  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_final,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) FILTER (WHERE o_totalprice > 200000) AS DOUBLE) AS big_total
           FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    ),
    (
        "bool_aggregates",  # every/any family
        """SELECT l_returnflag,
                  BOOL_AND(l_quantity > 0) AS all_positive,
                  BOOL_OR(l_quantity >= 50) AS any_max_qty
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ),
    (
        "setop_intersect_all",  # intersect_all.q
        """SELECT o_custkey FROM orders WHERE o_totalprice > 350000
           INTERSECT ALL
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 300000""",
    ),
    (
        "setop_except_all",  # except_all.q: multiset difference keeps multiplicity
        """SELECT o_custkey FROM orders WHERE o_totalprice > 300000
           EXCEPT ALL
           SELECT o_custkey FROM orders WHERE o_totalprice > 400000""",
    ),
    (
        "scalar_subquery_comparison",  # cbo_subq: comparison against uncorrelated scalar
        """SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM orders)
           ORDER BY o_totalprice DESC, o_orderkey""",
    ),
    (
        "correlated_scalar_projection",  # scalar subquery in SELECT list, correlated
        """SELECT n_nationkey, n_name,
                  (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey) AS n_supp
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "regexp_extract_parity",  # udf_regexp_extract.q: same signature both engines
        """SELECT p_partkey,
                  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) AS first_word,
                  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word
           FROM part WHERE p_partkey % 173 = 0 ORDER BY p_partkey""",
    ),
    (
        "greatest_least",  # udf_greatest.q / udf_least.q
        """SELECT l_orderkey, l_linenumber,
                  GREATEST(l_quantity, l_discount * 100, CAST(l_linenumber AS DOUBLE)) AS g,
                  LEAST(l_quantity, l_tax * 100, 25.0) AS l
           FROM lineitem WHERE l_orderkey % 701 = 3 ORDER BY l_orderkey, l_linenumber""",
    ),
    (
        "math_function_parity",  # udf_sqrt/exp/ln/power rounded to common precision
        """SELECT p_partkey,
                  round(sqrt(CAST(p_retailprice AS DOUBLE)), 6) AS sq,
                  round(ln(CAST(p_retailprice AS DOUBLE)), 6) AS lg,
                  round(power(CAST(p_size AS DOUBLE), 2), 6) AS pw,
                  round(exp(CAST(p_size AS DOUBLE) / 50), 6) AS ex
           FROM part WHERE p_partkey % 211 = 0 ORDER BY p_partkey""",
    ),
    (
        "like_escape",  # udf_like.q with ESCAPE
        """SELECT COUNT(*) AS n FROM documents
           WHERE text LIKE '%100!%%' ESCAPE '!' OR text LIKE '%table%'""",
    ),
    (
        "limit_offset",  # limit family: LIMIT ... OFFSET pagination
        """SELECT o_orderkey, o_totalprice FROM orders
           ORDER BY o_totalprice DESC, o_orderkey
           LIMIT 10 OFFSET 20""",
    ),
    (
        "join_using_clause",  # JOIN ... USING resolves one shared column
        """SELECT n_regionkey, COUNT(*) AS n
           FROM (SELECT n_regionkey FROM nation) a
           JOIN (SELECT r_regionkey AS n_regionkey, r_name FROM region) b
           USING (n_regionkey)
           GROUP BY n_regionkey ORDER BY n_regionkey""",
    ),
    (
        "coalesce_join_key",  # null-safe-ish join via COALESCE key normalization
        """SELECT COUNT(*) AS n
           FROM (SELECT COALESCE(CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END, -1) AS k
                 FROM customer) a
           JOIN (SELECT n_nationkey AS k FROM nation UNION ALL SELECT -1) b USING (k)""",
    ),
    (
        "cte_referenced_twice",  # CTE reuse: one definition, two consumers
        """WITH filtered AS (
             SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 250000
           )
           SELECT a.o_custkey, a.n_big, b.top_price
           FROM (SELECT o_custkey, COUNT(*) AS n_big FROM filtered GROUP BY o_custkey) a
           JOIN (SELECT o_custkey, MAX(o_totalprice) AS top_price FROM filtered GROUP BY o_custkey) b
             ON a.o_custkey = b.o_custkey
           WHERE a.n_big >= 2 ORDER BY a.o_custkey""",
    ),
    (
        "nested_case_group_key",  # CASE expression as a grouping key
        """SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                       WHEN c_acctbal < 5000 THEN CASE WHEN c_mktsegment = 'BUILDING' THEN 'low_b' ELSE 'low' END
                       ELSE 'high' END AS bucket,
                  COUNT(*) AS n
           FROM customer GROUP BY 1 ORDER BY bucket""",
    ),
    (
        "agg_null_semantics",  # aggregates skip NULLs; COUNT(col) vs COUNT(*)
        """SELECT COUNT(*) AS n_rows,
                  COUNT(CASE WHEN o_orderkey % 3 = 0 THEN o_orderkey END) AS n_nonnull,
                  CAST(SUM(CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_totalprice AS DECIMAL(38,2)) END) AS DOUBLE) AS sum_subset,
                  round(AVG(CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_totalprice AS DOUBLE) END), 4) AS avg_subset
           FROM orders""",
    ),
    (
        "full_outer_merge_shape",  # classic upsert/merge diff: FULL OUTER + COALESCE
        """SELECT COALESCE(a.k, b.k) AS k,
                  a.n AS before_n, b.n AS after_n,
                  CASE WHEN a.k IS NULL THEN 'added'
                       WHEN b.k IS NULL THEN 'removed'
                       WHEN a.n <> b.n THEN 'changed' ELSE 'same' END AS delta
           FROM (SELECT o_orderpriority AS k, COUNT(*) AS n FROM orders
                 WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1) a
           FULL OUTER JOIN
                (SELECT o_orderpriority AS k, COUNT(*) AS n FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' GROUP BY 1) b
             ON a.k = b.k
           ORDER BY k""",
    ),
    (
        "exists_with_or",  # subquery_exists variants: EXISTS OR predicate
        """SELECT s_suppkey FROM supplier s
           WHERE s_acctbal > 9500
              OR EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s.s_suppkey AND l_quantity = 50)
           ORDER BY s_suppkey""",
    ),
    (
        "double_nested_subquery",  # two-level nesting: IN over IN
        """SELECT n_name FROM nation
           WHERE n_nationkey IN (
             SELECT c_nationkey FROM customer WHERE c_custkey IN (
               SELECT o_custkey FROM orders WHERE o_totalprice > 450000))
           ORDER BY n_name""",
    ),
    (
        "window_over_join",  # windowing over join output
        """SELECT c_mktsegment, o_orderkey,
                  ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders JOIN customer ON c_custkey = o_custkey
           WHERE o_totalprice > 420000
           ORDER BY c_mktsegment, rn""",
    ),
    (
        "distinct_top_ordered",  # distinct + order + limit composition
        """SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
           ORDER BY o_orderpriority, o_orderstatus LIMIT 8""",
    ),
    (
        "string_order_collation",  # binary collation ordering parity
        """SELECT p_name FROM part WHERE p_partkey % 401 = 0
           ORDER BY p_name, p_partkey""",
    ),
    (
        "in_and_not_in_combined",  # IN plus NOT IN on different subqueries
        """SELECT c_custkey FROM customer
           WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
             AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
             AND c_custkey % 3 = 0
           ORDER BY c_custkey""",
    ),
    (
        "join_on_date_expression",  # join key is a computed date bucket
        """SELECT a.yr, a.n AS n_orders, b.n AS n_ship
           FROM (SELECT extract(year FROM o_orderdate) AS yr, COUNT(*) AS n
                 FROM orders GROUP BY 1) a
           JOIN (SELECT extract(year FROM l_shipdate) AS yr, COUNT(*) AS n
                 FROM lineitem GROUP BY 1) b
             ON a.yr = b.yr
           ORDER BY a.yr""",
    ),
    (
        "not_exists_aggregated",  # NOT EXISTS against an aggregated correlation
        """SELECT r_name FROM region r
           WHERE NOT EXISTS (
             SELECT 1 FROM nation n JOIN supplier s ON s_nationkey = n_nationkey
             WHERE n.n_regionkey = r.r_regionkey AND s_acctbal < -990)
           ORDER BY r_name""",
    ),
    (
        "union_in_cte_twice",  # union branch defined once in CTE, consumed twice
        """WITH u AS (
             SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
             UNION
             SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9900
           )
           SELECT (SELECT COUNT(*) FROM u) AS n_all,
                  (SELECT COUNT(*) FROM u WHERE k % 2 = 0) AS n_even""",
    ),
]

# Round-2 fifth tranche: the clientpositive families VERDICT r1 called
# "big untouched" — udf_* (201 files), join filter semantics
# (join_filters.q et al.), vectorized expression semantics (vector_*,
# 89 files — value tests of the same cast/math/date exprs the
# reference's vectorized twins evaluate), groupby positional/expr keys.
# Portability set was probe-verified on BOTH engines first (strpos,
# locate, conv, add_months, overlay, elt, initcap are DuckDB-absent
# and excluded; `^` means POWER in DuckDB so bitwise xor is excluded).
QSCRIPTS_R5 = [
    (
        "udf_string_batch1",  # udf_instr.q/udf_lpad.q/udf_rpad.q/udf_repeat.q/udf_reverse.q
        """SELECT p_partkey,
                  instr(p_name, 'a') AS pos_a,
                  lpad(p_brand, 12, '.') AS brand_l,
                  rpad(p_brand, 12, '.') AS brand_r,
                  reverse(p_brand) AS brand_rev,
                  repeat(left(p_brand, 2), 2) AS b2x2
           FROM part WHERE p_partkey % 97 = 1""",
    ),
    (
        "udf_string_batch2",  # udf_translate.q/udf_ascii.q/udf_concat_ws.q/udf_10_trims.q
        """SELECT p_partkey,
                  translate(p_type, 'AEIOU', 'aeiou') AS ty_lowvowel,
                  ascii(p_brand) AS first_code,
                  chr(65 + CAST(p_partkey % 26 AS INT)) AS rotor,
                  concat_ws('|', p_brand, p_type) AS tagged,
                  trim(BOTH '#' FROM concat('##', p_brand, '##')) AS untagged
           FROM part WHERE p_partkey % 97 = 2""",
    ),
    (
        "udf_string_batch3",  # udf_split.q (split_part spelling)/udf_length.q/position
        """SELECT p_partkey,
                  split_part(p_type, ' ', 1) AS ty_head,
                  split_part(p_type, ' ', 2) AS ty_mid,
                  length(p_name) AS name_len,
                  position('1' in p_brand) AS pos1,
                  upper(left(p_type, 3)) AS ty3
           FROM part WHERE p_partkey % 97 = 3""",
    ),
    (
        "udf_levenshtein",  # udf_levenshtein.q over a data-driven pair
        """SELECT n1.n_name AS a, n2.n_name AS b,
                  levenshtein(n1.n_name, n2.n_name) AS dist
           FROM nation n1 JOIN nation n2
             ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey""",
    ),
    (
        "udf_math_batch1",  # udf_power/exp/ln/log2/log10/sqrt/cbrt over acctbal
        """SELECT c_custkey,
                  round(power(CAST(c_acctbal AS DOUBLE) / 1000, 2), 4) AS sq,
                  round(sqrt(abs(CAST(c_acctbal AS DOUBLE))), 4) AS rt,
                  round(cbrt(abs(CAST(c_acctbal AS DOUBLE))), 4) AS crt,
                  round(ln(abs(CAST(c_acctbal AS DOUBLE)) + 1), 4) AS lg,
                  round(log10(abs(CAST(c_acctbal AS DOUBLE)) + 1), 4) AS lg10,
                  round(log2(abs(CAST(c_acctbal AS DOUBLE)) + 1), 4) AS lg2
           FROM customer WHERE c_custkey % 53 = 7""",
    ),
    (
        "udf_math_batch2",  # udf_degrees/radians/atan2/sign/factorial
        """SELECT p_partkey,
                  round(degrees(CAST(p_retailprice AS DOUBLE) / 1000), 4) AS deg,
                  round(radians(CAST(p_size AS DOUBLE)), 4) AS rad,
                  round(atan2(CAST(p_size AS DOUBLE), 10.0), 4) AS theta,
                  CAST(sign(p_size - 25) AS INT) AS side,
                  factorial(p_size % 10) AS f
           FROM part WHERE p_partkey % 89 = 5""",
    ),
    (
        "udf_bitwise",  # udf_bitwise_and/or/not.q + shifts + bit_count (no xor: DuckDB `^`=power)
        """SELECT o_orderkey,
                  o_orderkey & 255 AS low8,
                  o_orderkey | 4096 AS with_bit,
                  ~o_orderkey AS inverted,
                  o_orderkey << 2 AS shl,
                  o_orderkey >> 3 AS shr,
                  bit_count(o_orderkey) AS popcnt
           FROM orders WHERE o_orderkey % 211 = 9""",
    ),
    (
        "udf_hex_bin",  # udf_hex.q/udf_bin.q
        """SELECT o_orderkey, hex(o_orderkey) AS h, bin(o_orderkey) AS b
           FROM orders WHERE o_orderkey % 211 = 11""",
    ),
    (
        "udf_date_batch1",  # udf_last_day/weekofyear/dayofyear/quarter
        """SELECT o_orderkey,
                  last_day(CAST(o_orderdate AS DATE)) AS month_end,
                  weekofyear(CAST(o_orderdate AS DATE)) AS wk,
                  dayofyear(CAST(o_orderdate AS DATE)) AS doy,
                  quarter(CAST(o_orderdate AS DATE)) AS q
           FROM orders WHERE o_orderkey % 173 = 3""",
    ),
    (
        "udf_date_interval",  # date arithmetic via INTERVAL (vectorized_date_funcs.q)
        """SELECT l_orderkey, l_linenumber,
                  CAST(l_shipdate + INTERVAL 30 DAY AS DATE) AS due,
                  CAST(l_shipdate - INTERVAL 1 DAY AS DATE) AS eve,
                  CAST(date_trunc('month', l_shipdate) AS DATE) AS mstart
           FROM lineitem WHERE l_orderkey % 419 = 17""",
    ),
    (
        "vectorized_casts",  # vectorized_casts.q: cast lattice as VALUE semantics
        """SELECT o_orderkey,
                  CAST(o_orderkey AS STRING) AS k_str,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING) AS price_str,
                  CAST(CAST(o_orderkey AS STRING) AS BIGINT) AS k_back,
                  CAST(floor(o_totalprice) AS BIGINT) AS price_int,
                  CAST(CAST(o_orderdate AS DATE) AS STRING) AS d_str
           FROM orders WHERE o_orderkey % 223 = 19""",
    ),
    (
        "vectorized_try_cast",  # vectorized cast-overflow semantics, NULL not error
        """SELECT p_partkey,
                  try_cast(p_brand AS INT) AS not_a_number,
                  try_cast(split_part(p_brand, '_', 2) AS INT) AS brand_num
           FROM part WHERE p_partkey % 97 = 7""",
    ),
    (
        "vector_between_in_dates_r5",  # vector_between_in.q: BETWEEN on date/decimal + IN lists
        """SELECT l_orderkey, l_linenumber, l_quantity
           FROM lineitem
           WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-03-01' AND DATE '1996-03-15'
             AND l_quantity IN (1, 2, 3, 48, 49, 50)
           ORDER BY l_orderkey, l_linenumber""",
    ),
    (
        "vector_decimal_aggregate",  # vector_decimal_aggregate.q
        """SELECT l_returnflag,
                  COUNT(*) AS cnt,
                  CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS min_p,
                  CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_p,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_p
           FROM lineitem GROUP BY l_returnflag""",
    ),
    (
        "join_filters_on_vs_where",  # join_filters.q: ON-clause pred NULL-extends, WHERE filters
        """SELECT n_name, r_name
           FROM nation LEFT JOIN region
             ON n_regionkey = r_regionkey AND r_name LIKE '%R%'
           ORDER BY n_name""",
    ),
    (
        "join_filters_where_form",  # join_filters.q counterpart: same pred in WHERE
        """SELECT n_name, r_name
           FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
           WHERE r_name LIKE '%R%'
           ORDER BY n_name""",
    ),
    (
        "join_nullsafe",  # join_nullsafe.q: IS NOT DISTINCT FROM join over derived NULL keys
        """SELECT a.n_nationkey, b.n_nationkey AS peer
           FROM (SELECT n_nationkey,
                        CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END AS k
                 FROM nation) a
           JOIN (SELECT n_nationkey,
                        CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END AS k
                 FROM nation) b
             ON a.k IS NOT DISTINCT FROM b.k AND a.n_nationkey < b.n_nationkey""",
    ),
    (
        "join_five_way_chain",  # join query chains (join32.q-style multiway)
        """SELECT r_name, COUNT(*) AS n_items,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS qty
           FROM region
           JOIN nation ON n_regionkey = r_regionkey
           JOIN supplier ON s_nationkey = n_nationkey
           JOIN lineitem ON l_suppkey = s_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           WHERE o_orderpriority = '1-URGENT'
           GROUP BY r_name""",
    ),
    (
        "join_disjunctive_pred",  # non-equi join with OR condition (small sides)
        """SELECT n1.n_name AS a, n2.n_name AS b
           FROM nation n1 JOIN nation n2
             ON (n1.n_regionkey = n2.n_regionkey OR n1.n_nationkey = n2.n_regionkey)
                AND n1.n_nationkey <> n2.n_nationkey
           WHERE n1.n_nationkey % 5 = 0""",
    ),
    (
        "join_self_pairs",  # join40.q-style self-join with aliases, bounded
        """SELECT c1.c_custkey AS a, c2.c_custkey AS b
           FROM customer c1 JOIN customer c2
             ON c1.c_nationkey = c2.c_nationkey
                AND c1.c_custkey < c2.c_custkey
           WHERE c1.c_custkey % 20 = 0 AND c2.c_custkey % 20 = 0""",
    ),
    (
        "join_right_outer",  # join rarities: RIGHT OUTER spelled as such
        """SELECT o_orderkey, c_name
           FROM orders RIGHT OUTER JOIN customer ON o_custkey = c_custkey
           WHERE c_custkey % 97 = 13""",
    ),
    (
        "groupby_position_year_r5",  # groupby_position.q: ordinal GROUP BY/ORDER BY
        """SELECT o_orderpriority, extract(year FROM o_orderdate) AS yr, COUNT(*) AS cnt
           FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    (
        "groupby_expr_key",  # groupby expression key (CASE bucketing)
        """SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                       WHEN c_acctbal < 5000 THEN 'mid'
                       ELSE 'high' END AS band,
                  COUNT(*) AS cnt,
                  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS total
           FROM customer GROUP BY 1""",
    ),
    (
        "groupby_distinct_samekey_r5",  # groupby_distinct_samekey.q
        """SELECT l_suppkey % 10 AS bucket,
                  COUNT(DISTINCT l_suppkey) AS n_supp,
                  COUNT(l_suppkey) AS n_rows
           FROM lineitem GROUP BY l_suppkey % 10""",
    ),
    (
        "ppd_outer_join",  # ppd_outer_join family: filter above LEFT JOIN prunes to inner
        """SELECT c_custkey, o_orderkey
           FROM customer LEFT JOIN orders ON o_custkey = c_custkey
           WHERE o_totalprice > 450000""",
    ),
    (
        "ppd_union_branch",  # ppd_union.q: predicate pushed into both union branches
        """SELECT k, v FROM (
             SELECT c_custkey AS k, CAST(c_acctbal AS DOUBLE) AS v FROM customer
             UNION ALL
             SELECT s_suppkey AS k, CAST(s_acctbal AS DOUBLE) AS v FROM supplier
           ) u WHERE v > 9000 AND k % 3 = 1""",
    ),
    (
        "udf_case_nested_two_col_r5",  # udf_case.q: nested CASE with fallthrough over two columns
        """SELECT o_orderkey,
                  CASE o_orderstatus
                    WHEN 'F' THEN CASE WHEN o_totalprice > 200000 THEN 'big-final'
                                       ELSE 'small-final' END
                    WHEN 'O' THEN 'open'
                    ELSE 'other'
                  END AS verdict
           FROM orders WHERE o_orderkey % 157 = 23""",
    ),
    (
        "udf_ifnull_chain",  # udf_coalesce.q/ifnull: NULL-handling scalar lattice
        """SELECT n_nationkey,
                  ifnull(nullif(n_regionkey, 2), -1) AS region_or_sentinel,
                  coalesce(nullif(n_regionkey, 0), nullif(n_regionkey, 1), 99) AS first_nonnull,
                  if(n_regionkey >= 2, 'hi', 'lo') AS half
           FROM nation""",
    ),
    (
        "vector_string_concat",  # vector_string_concat.q: concat pipelines stay vectorized
        """SELECT concat(p_brand, '/', split_part(p_type, ' ', 1),
                         '#', CAST(p_size AS STRING)) AS sku
           FROM part WHERE p_partkey % 97 = 29""",
    ),
    (
        "distinct_join_output",  # distinct above join (reduce-dedup plan family)
        """SELECT DISTINCT n_name, o_orderpriority
           FROM nation
           JOIN customer ON c_nationkey = n_nationkey
           JOIN orders ON o_custkey = c_custkey
           WHERE n_nationkey < 5""",
    ),
    (
        "udf_md5_hashing",  # udf hash family: md5 is the portable member
        """SELECT c_custkey, md5(c_name) AS name_md5
           FROM customer WHERE c_custkey % 101 = 31""",
    ),
    (
        "order_by_expr_multi",  # order by computed expressions + mixed direction
        """SELECT s_suppkey, s_acctbal
           FROM supplier
           ORDER BY CAST(s_acctbal AS DOUBLE) % 100 DESC, s_suppkey ASC
           LIMIT 25""",
    ),
]


# Round-4 tranche: the remaining untouched clientpositive families —
# ptf_* beyond matchpath (ptf.q, ptf_general_queries.q,
# ptf_streaming.q re-expressed as plain window SQL: Spark has no
# noop() PTF and needs none — `OVER (PARTITION BY .. ORDER BY ..)`
# IS the PTF), the windowing_* long tail (udaf, windowspec,
# columnPruning, rowcontainer-size frames, cume_dist/percent_rank),
# and the cbo_* variants (gby/join/limit/union/views/udf_udaf/
# semijoin — nested derived-table aggregates with having/order
# shapes that exercise CBO join reordering). Window frames over
# DOUBLE sum in DECIMAL then cast (running-fold association is not
# engine-portable for floats); every window with a frame or nav
# function orders by a unique tiebreaker.
QSCRIPTS_R6 = [
    (
        "ptf_noop_rank_running_sum",  # ptf.q test1: rank+dense_rank+running sum over ordered partition
        """SELECT p_brand, p_name, p_size,
                  RANK() OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey) AS r,
                  DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey) AS dr,
                  CAST(SUM(CAST(p_retailprice AS DECIMAL(38,2)))
                       OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS s1
           FROM part""",
    ),
    (
        "ptf_lag_delta",  # ptf.q test2: size delta vs previous row, lag with default
        """SELECT p_brand, p_name, p_size,
                  p_size - LAG(p_size, 1, p_size)
                    OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey) AS delta_sz
           FROM part""",
    ),
    (
        "ptf_join_then_window",  # ptf.q testJoinWithNoop: self-join feeding a window
        """SELECT j.p_brand, j.p_name,
                  j.p_size - LAG(j.p_size, 1, j.p_size)
                    OVER (PARTITION BY j.p_brand ORDER BY j.p_name, j.p_partkey) AS delta_sz
           FROM (SELECT p1.* FROM part p1 JOIN part p2 ON p1.p_partkey = p2.p_partkey) j""",
    ),
    (
        "ptf_agg_then_window",  # ptf_general_queries.q: windows over a grouped child
        """SELECT p_brand, n_parts, total,
                  RANK() OVER (ORDER BY total DESC, p_brand) AS value_rank
           FROM (SELECT p_brand, COUNT(*) AS n_parts,
                        CAST(SUM(CAST(p_retailprice AS DECIMAL(38,2))) AS DOUBLE) AS total
                 FROM part GROUP BY p_brand) g""",
    ),
    (
        "ptf_multi_window_one_partition",  # ptf_streaming.q: several windows sharing one partition spec
        """SELECT l_suppkey, l_orderkey, l_linenumber,
                  ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber) AS rn,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2)))
                       OVER (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber
                             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty,
                  MAX(l_quantity) OVER (PARTITION BY l_suppkey) AS max_qty
           FROM lineitem WHERE l_suppkey < 20""",
    ),
    (
        "ptf_decimal_frame",  # ptf_decimal.q: decimal arithmetic inside a moving frame
        """SELECT p_partkey,
                  CAST(SUM(CAST(p_retailprice AS DECIMAL(38,2)))
                       OVER (ORDER BY p_partkey
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3
           FROM part WHERE p_partkey <= 500""",
    ),
    (
        "windowing_udaf_partition_aggs",  # windowing_udaf.q: min/max/avg/count over unordered partitions
        """SELECT s_nationkey, s_suppkey,
                  MIN(s_acctbal) OVER (PARTITION BY s_nationkey) AS mn,
                  MAX(s_acctbal) OVER (PARTITION BY s_nationkey) AS mx,
                  COUNT(*) OVER (PARTITION BY s_nationkey) AS cnt
           FROM supplier""",
    ),
    (
        "windowing_windowspec_named_reuse",  # windowing_windowspec.q: one ordered spec, several functions
        """SELECT c_custkey, c_acctbal,
                  ROW_NUMBER() OVER w AS rn,
                  LEAD(c_custkey, 1) OVER w AS nxt,
                  LAG(c_custkey, 1) OVER w AS prv
           FROM customer
           WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)""",
    ),
    (
        "windowing_column_pruning",  # windowing_columnPruning.q: only the windowed column projected
        """SELECT RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS r
           FROM lineitem WHERE l_orderkey < 100""",
    ),
    (
        "windowing_big_row_frame",  # windowing_adjust_rowcontainer_sz.q: frame wider than buffer defaults
        """SELECT o_orderkey,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2)))
                       OVER (ORDER BY o_orderkey
                             ROWS BETWEEN 100 PRECEDING AND 100 FOLLOWING) AS DOUBLE) AS neighborhood
           FROM orders WHERE o_orderkey <= 2000""",
    ),
    (
        "windowing_cume_dist_percent_rank",  # windowing.q: rank-family rationals (tie-insensitive)
        """SELECT p_size,
                  CUME_DIST() OVER (ORDER BY p_size) AS cd,
                  PERCENT_RANK() OVER (ORDER BY p_size) AS pr
           FROM part WHERE p_partkey <= 300""",
    ),
    (
        "windowing_first_last_frames",  # windowing_navfn.q remainder: first/last_value under explicit frames
        """SELECT o_orderkey, o_totalprice,
                  FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice DESC, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS costliest_so_far,
                  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice DESC, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cheapest_overall
           FROM orders WHERE o_orderkey <= 1000""",
    ),
    (
        "windowing_nested_in_expression",  # windowing_expressions.q: window result inside arithmetic
        """SELECT c_custkey,
                  c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey) AS bal_vs_nation
           FROM customer WHERE c_custkey <= 500""",
    ),
    (
        "cbo_gby_expr_keys",  # cbo_gby.q: expression group keys + projected arithmetic
        """SELECT o_custkey % 7 AS bucket, (COUNT(*) + 1) * 2 AS x,
                  CAST(SUM(o_orderkey) AS BIGINT) AS keysum
           FROM orders GROUP BY o_custkey % 7""",
    ),
    (
        "cbo_gby_regroup_outer",  # cbo_gby.q: group over a grouped child's outputs
        """SELECT x, y, COUNT(*) AS n FROM (
             SELECT o_orderstatus AS k, o_custkey % 5 + 1 AS x,
                    CAST(SUM(o_custkey) AS BIGINT) AS y
             FROM orders GROUP BY o_orderstatus, o_custkey % 5
           ) r GROUP BY y, x""",
    ),
    (
        "cbo_join_two_aggregated_subqueries",  # cbo_gby.q/cbo_join.q: derived aggregates joined, filtered, regrouped
        """SELECT t3.n_regionkey, t1.c, COUNT(*) AS n
           FROM (SELECT c_nationkey AS a, COUNT(*) + 1 AS b, CAST(SUM(c_custkey) AS BIGINT) AS c
                 FROM customer WHERE c_custkey + 1 >= 0 AND (c_custkey > 0 OR c_acctbal >= 0)
                 GROUP BY c_nationkey) t1
           JOIN (SELECT s_nationkey AS p, COUNT(*) + 1 AS q, CAST(SUM(s_suppkey) AS BIGINT) AS r
                 FROM supplier WHERE s_suppkey + 1 >= 0 AND (s_suppkey > 0 OR s_acctbal >= 0)
                 GROUP BY s_nationkey) t2 ON t1.a = t2.p
           JOIN nation t3 ON t1.a = t3.n_nationkey
           WHERE t1.b + t2.q >= 0 AND (t1.b > 0 OR t3.n_nationkey >= 0)
           GROUP BY t3.n_regionkey, t1.c""",
    ),
    (
        "cbo_outer_left_derived",  # cbo_gby.q left-outer variant with having on both children
        """SELECT t1.a, t1.c, t2.r
           FROM (SELECT c_nationkey AS a, CAST(SUM(c_custkey) AS BIGINT) AS c
                 FROM customer GROUP BY c_nationkey
                 HAVING COUNT(*) >= 1 AND SUM(c_acctbal) IS NOT NULL) t1
           LEFT OUTER JOIN (SELECT s_nationkey AS p, CAST(SUM(s_suppkey) AS BIGINT) AS r
                 FROM supplier GROUP BY s_nationkey
                 HAVING COUNT(*) >= 2) t2 ON t1.a = t2.p""",
    ),
    (
        "cbo_outer_right_derived",  # cbo_gby.q right-outer variant
        """SELECT t2.p, t2.r, t1.c
           FROM (SELECT c_nationkey AS a, CAST(SUM(c_custkey) AS BIGINT) AS c
                 FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 40) t1
           RIGHT OUTER JOIN (SELECT s_nationkey AS p, CAST(SUM(s_suppkey) AS BIGINT) AS r
                 FROM supplier GROUP BY s_nationkey) t2 ON t1.a = t2.p""",
    ),
    (
        "cbo_outer_full_derived",  # cbo_gby.q full-outer variant with post-join filter semantics
        """SELECT t1.a, t2.p, COALESCE(t1.c, 0) + COALESCE(t2.r, 0) AS combined
           FROM (SELECT c_nationkey AS a, CAST(SUM(c_custkey) AS BIGINT) AS c
                 FROM customer WHERE c_nationkey < 10 GROUP BY c_nationkey) t1
           FULL OUTER JOIN (SELECT s_nationkey AS p, CAST(SUM(s_suppkey) AS BIGINT) AS r
                 FROM supplier WHERE s_nationkey >= 5 GROUP BY s_nationkey) t2
             ON t1.a = t2.p""",
    ),
    (
        "cbo_limit_ordered_subquery",  # cbo_limit.q: ORDER BY + LIMIT inside a derived table, outer agg
        """SELECT COUNT(*) AS n, CAST(MIN(bal) AS DOUBLE) AS min_bal FROM (
             SELECT c_acctbal AS bal FROM customer
             ORDER BY c_acctbal DESC, c_custkey LIMIT 20
           ) top20""",
    ),
    (
        "cbo_union_then_agg",  # cbo_union.q: UNION (distinct) of two selects, aggregated
        """SELECT nk, COUNT(*) AS n FROM (
             SELECT c_nationkey AS nk FROM customer
             UNION
             SELECT s_nationkey AS nk FROM supplier
           ) u GROUP BY nk""",
    ),
    (
        "cbo_views_as_cte_stack",  # cbo_views.q: view-over-view resolved as stacked CTEs
        """WITH v1 AS (SELECT n_nationkey, n_regionkey, n_name FROM nation WHERE n_nationkey > 0),
                v2 AS (SELECT v1.*, r_name FROM v1 JOIN region ON v1.n_regionkey = r_regionkey),
                v3 AS (SELECT r_name, COUNT(*) AS n FROM v2 GROUP BY r_name)
           SELECT * FROM v3 WHERE n >= 2""",
    ),
    (
        "cbo_udf_udaf_distinct_mix",  # cbo_udf_udaf.q: plain + distinct aggregates in one select
        """SELECT o_orderstatus,
                  COUNT(*) AS n,
                  COUNT(DISTINCT o_custkey) AS custs,
                  CAST(SUM(DISTINCT o_custkey % 100) AS BIGINT) AS dsum
           FROM orders GROUP BY o_orderstatus""",
    ),
    (
        "cbo_semijoin_in_plus_exists",  # cbo_semijoin.q: IN and correlated EXISTS conjoined
        """SELECT n_name FROM nation n
           WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)
             AND EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey
                         AND c.c_acctbal > 9000)""",
    ),
    (
        "cbo_stats_count_family",  # cbo_stats.q: the count(*) / count(col) / count(distinct) triple
        """SELECT COUNT(*) AS all_rows,
                  COUNT(o_custkey) AS non_null,
                  COUNT(DISTINCT o_orderstatus) AS statuses
           FROM orders""",
    ),
    (
        "cbo_simple_select_projections",  # cbo_simple_select.q: arithmetic+string projection with filter
        """SELECT c_custkey + 1 AS k1, c_custkey * 2 AS k2,
                  UPPER(c_mktsegment) AS seg, LENGTH(c_name) AS name_len
           FROM customer WHERE c_custkey BETWEEN 10 AND 60 AND c_mktsegment <> ''""",
    ),
    (
        "having_unselected_aggregate",  # having.q: HAVING references an aggregate not in SELECT
        """SELECT o_custkey FROM orders
           GROUP BY o_custkey HAVING COUNT(*) >= 12 AND MAX(o_totalprice) > 100""",
    ),
    (
        "join_reorder_selective_far_table",  # join_reorder2.q: filter on the far end of a 4-table chain
        """SELECT r_name, COUNT(*) AS n
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA' AND l_quantity > 45
           GROUP BY r_name""",
    ),
    (
        "mapjoin_distinct_after_join",  # mapjoin_distinct.q: DISTINCT over a broadcast-join result
        """SELECT DISTINCT n_name
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           WHERE s_acctbal > 5000""",
    ),
    (
        "groupby_sort_top_aggregates",  # groupby_sort_1.q: agg + order by aggregate desc + limit
        """SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS rev
           FROM lineitem GROUP BY l_partkey
           ORDER BY rev DESC, l_partkey LIMIT 30""",
    ),
    (
        "order_by_null_positions",  # order_null.q: explicit NULLS FIRST / NULLS LAST
        """SELECT c.c_custkey, o.o_orderkey
           FROM (SELECT * FROM customer WHERE c_custkey <= 40) c
           LEFT JOIN (SELECT * FROM orders WHERE o_orderkey % 3 = 0) o
             ON c.c_custkey = o.o_custkey AND o.o_orderkey < 500
           ORDER BY o.o_orderkey DESC NULLS FIRST, c.c_custkey ASC
           LIMIT 50""",
    ),
    (
        "limit_pushdown_through_window",  # limit_pushdown.q: LIMIT above a window function
        """SELECT * FROM (
             SELECT s_suppkey, s_acctbal,
                    ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rn
             FROM supplier
           ) ranked WHERE rn <= 12 ORDER BY rn""",
    ),
    (
        "udf_case_null_branches",  # udf_case.q: CASE chains with NULL-producing branches
        """SELECT o_orderkey,
                  CASE WHEN o_totalprice > 400000 THEN 'jumbo'
                       WHEN o_totalprice > 200000 THEN 'large'
                       WHEN o_totalprice IS NULL THEN NULL
                       ELSE 'standard' END AS size_class,
                  CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 ELSE NULL END AS status_code
           FROM orders WHERE o_orderkey <= 400""",
    ),
    (
        "udf_coalesce_nullif_chain",  # udf_coalesce.q: coalesce over nullif over case
        """SELECT n_nationkey,
                  COALESCE(NULLIF(n_name, 'FRANCE'), '<redacted>') AS display_name,
                  COALESCE(NULLIF(n_regionkey, 3), -1) AS masked_region
           FROM nation""",
    ),
    (
        "union_typed_null_columns",  # union_null.q: NULL columns unified across branches
        """SELECT src, val FROM (
             SELECT 'a' AS src, CAST(NULL AS DOUBLE) AS val FROM region
             UNION ALL
             SELECT 'b' AS src, r_regionkey * 1.5 AS val FROM region
           ) u ORDER BY src, val NULLS LAST""",
    ),
    (
        "ppd_transitive_join_keys",  # ppd_join filters propagate across equi-join keys
        """SELECT COUNT(*) AS n
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           WHERE o.o_orderkey < 300""",
    ),
    (
        "correlationoptimizer_shared_child",  # correlationoptimizer1.q: two aggregations of one child, joined
        """SELECT a.o_custkey, a.n_orders, b.total
           FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) a
           JOIN (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
                 FROM orders GROUP BY o_custkey) b
             ON a.o_custkey = b.o_custkey
           WHERE a.n_orders >= 12""",
    ),
    (
        "interval_timestamp_arithmetic",  # timestamp_arith shapes: INTERVAL add/subtract + comparison
        """SELECT event_id, ts
           FROM events
           WHERE ts + INTERVAL 1 HOUR < TIMESTAMP '2024-01-01 06:00:00'
             AND ts - INTERVAL 30 MINUTE > TIMESTAMP '2024-01-01 00:00:00'
           ORDER BY event_id LIMIT 40""",
    ),
    (
        "extract_datetime_fields",  # udf_datetime family: year/month/day/hour extraction parity
        """SELECT year(ts) AS y, month(ts) AS m, day(ts) AS d, hour(ts) AS h, COUNT(*) AS n
           FROM events GROUP BY year(ts), month(ts), day(ts), hour(ts)""",
    ),
    (
        "string_pad_trim_family",  # udf_lpad/rpad/trim parity batch
        """SELECT n_nationkey,
                  LPAD(n_name, 12, '.') AS padded_l,
                  RPAD(n_name, 12, '.') AS padded_r,
                  TRIM('  ' || n_name || ' ') AS trimmed,
                  LTRIM('xxx' || n_name) AS lt,
                  RTRIM(n_name || '  ') AS rt
           FROM nation""",
    ),
    (
        "windowing_ntile_cume_combo",  # windowing_ntile.q remainder: ntile alongside rank rationals
        """SELECT c_custkey,
                  NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
                  RANK() OVER (ORDER BY c_acctbal, c_custkey) AS rnk
           FROM customer WHERE c_custkey <= 200""",
    ),
]


# Round-4 second tranche: auto_join* (ON-clause filter semantics per
# join type, expression keys, null keys, multi-distinct children,
# join→group shapes), the groupby* map-side long tail (substring
# keys, mixed distinct/plain aggregates, group+limit), and singles
# from constprop/fold_case/annotate_stats/order/limit/scalar-subquery
# families. Same portability discipline as R6.
QSCRIPTS_R7 = [
    (
        "auto_join0_ordered_subqueries",  # auto_join0.q: join of two ordered+limited derived tables
        """SELECT CAST(SUM(a.n_nationkey + b.r_regionkey) AS BIGINT) AS checksum
           FROM (SELECT n_nationkey, n_regionkey FROM nation ORDER BY n_nationkey LIMIT 10) a
           JOIN (SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 5) b
             ON a.n_regionkey = b.r_regionkey""",
    ),
    (
        "auto_join_filters_right_on",  # auto_join_filters.q: one-sided conditions inside RIGHT JOIN ON
        """SELECT a.n_nationkey, b.n_nationkey AS bk
           FROM nation a RIGHT OUTER JOIN nation b
             ON a.n_nationkey = b.n_nationkey AND a.n_regionkey > 1 AND b.n_regionkey < 4
           ORDER BY bk, a.n_nationkey""",
    ),
    (
        "auto_join_filters_full_on",  # auto_join_filters.q: FULL OUTER with conditions in ON
        """SELECT a.n_nationkey AS ak, b.n_nationkey AS bk
           FROM nation a FULL OUTER JOIN nation b
             ON a.n_nationkey = b.n_nationkey AND a.n_regionkey = 2 AND b.n_regionkey = 2
           ORDER BY ak NULLS LAST, bk NULLS LAST""",
    ),
    (
        "auto_join18_multi_distinct_child",  # auto_join18_multi_distinct.q: grouped children, one multi-distinct
        """SELECT a.nk, a.n_custs, a.n_segs, b.n_supps
           FROM (SELECT c_nationkey AS nk, COUNT(DISTINCT c_custkey) AS n_custs,
                        COUNT(DISTINCT c_mktsegment) AS n_segs
                 FROM customer GROUP BY c_nationkey) a
           JOIN (SELECT s_nationkey AS nk, COUNT(DISTINCT s_suppkey) AS n_supps
                 FROM supplier GROUP BY s_nationkey) b ON a.nk = b.nk""",
    ),
    (
        "auto_join26_join_then_group",  # auto_join26.q: join then group on the probe key
        """SELECT c.c_nationkey, COUNT(1) AS cnt
           FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
           GROUP BY c.c_nationkey""",
    ),
    (
        "auto_join_nulls_coalesced_keys",  # auto_join_nulls.q: nullable keys joined through coalesce
        """SELECT COUNT(*) AS n
           FROM (SELECT c.c_custkey, o.o_orderkey % 7 AS k
                 FROM customer c LEFT JOIN orders o
                   ON c.c_custkey = o.o_custkey AND o.o_totalprice > 450000) t1
           JOIN (SELECT n_nationkey % 7 AS k, n_nationkey FROM nation) t2
             ON COALESCE(t1.k, -1) = t2.k""",
    ),
    (
        "auto_join_expression_keys",  # auto_join27.q-style: join keys are expressions
        """SELECT COUNT(*) AS n, CAST(MIN(a.o_orderkey) AS BIGINT) AS first_key
           FROM orders a JOIN orders b
             ON a.o_orderkey % 1000 = b.o_orderkey % 1000 AND a.o_orderkey < b.o_orderkey
           WHERE a.o_orderkey < 50 AND b.o_orderkey < 1050""",
    ),
    (
        "join_cond_equi_plus_theta",  # join_cond_pushdown_1.q: mixed equi + theta conditions
        """SELECT COUNT(*) AS n
           FROM customer c JOIN supplier s
             ON c.c_nationkey = s.s_nationkey AND c.c_acctbal < s.s_acctbal""",
    ),
    (
        "join_three_aliases_same_table",  # join_alias resolution: table joined to itself twice
        """SELECT a.n_nationkey
           FROM nation a
           JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey
           JOIN nation c ON b.n_regionkey = c.n_regionkey AND c.n_nationkey = 0
           WHERE a.n_nationkey < 10
           GROUP BY a.n_nationkey ORDER BY a.n_nationkey""",
    ),
    (
        "groupby_substr_keys_mixed_aggs",  # groupby_multi_single_reducer.q: substring keys + distinct/plain mix
        """SELECT SUBSTR(c_name, 10, 1) AS key_digit,
                  COUNT(DISTINCT c_mktsegment) AS segs,
                  CAST(SUM(LENGTH(c_name)) AS BIGINT) AS name_chars,
                  COUNT(c_custkey) AS n
           FROM customer GROUP BY SUBSTR(c_name, 10, 1)""",
    ),
    (
        "groupby_two_views_union",  # groupby7.q/groupby8.q: two aggregations of one source unioned
        """SELECT * FROM (
             SELECT 'by_status' AS grp, o_orderstatus AS k, COUNT(*) AS n
             FROM orders GROUP BY o_orderstatus
             UNION ALL
             SELECT 'by_prio' AS grp, o_orderpriority AS k, COUNT(*) AS n
             FROM orders GROUP BY o_orderpriority
           ) u ORDER BY grp, k""",
    ),
    (
        "groupby_limit_deterministic",  # groupby1_limit.q: aggregate + ordered limit
        """SELECT o_custkey, COUNT(*) AS n
           FROM orders GROUP BY o_custkey
           ORDER BY n DESC, o_custkey LIMIT 15""",
    ),
    (
        "groupby_minmax_non_key_payload",  # groupby12.q: min/max carry non-key columns
        """SELECT n_regionkey, MIN(n_name) AS first_name, MAX(n_name) AS last_name,
                  CAST(MIN(n_nationkey) AS BIGINT) AS min_key
           FROM nation GROUP BY n_regionkey""",
    ),
    (
        "constprop_folded_predicates",  # constprop/fold_case: constant expressions folded at compile
        """SELECT n_nationkey, 2 + 3 AS five, 'x' || 'y' AS xy,
                  CASE WHEN 1 = 1 THEN n_name ELSE 'never' END AS name_copy
           FROM nation WHERE 1 = 1 AND 2 > 1 AND n_nationkey >= 0""",
    ),
    (
        "fold_case_in_where",  # fold_case.q: CASE inside the predicate
        """SELECT o_orderkey FROM orders
           WHERE CASE WHEN o_orderstatus = 'F' THEN o_totalprice > 100000
                      WHEN o_orderstatus = 'O' THEN o_totalprice > 300000
                      ELSE FALSE END
             AND o_orderkey <= 600
           ORDER BY o_orderkey""",
    ),
    (
        "annotate_stats_distinct_counts",  # annotate_stats_groupby.q: ndv-style distinct profile
        """SELECT COUNT(DISTINCT n_regionkey) AS regions,
                  COUNT(DISTINCT n_name) AS names,
                  COUNT(DISTINCT n_nationkey % 5) AS key_mod
           FROM nation""",
    ),
    (
        "order_by_expression_alias",  # order3.q: ORDER BY the alias of a computed column
        """SELECT s_suppkey, s_acctbal * 2 AS doubled
           FROM supplier ORDER BY doubled DESC, s_suppkey LIMIT 20""",
    ),
    (
        "order_by_ordinals",  # order_by_pos.q: ordinal ORDER BY references
        """SELECT n_regionkey, COUNT(*) AS n FROM nation
           GROUP BY n_regionkey ORDER BY 2 DESC, 1""",
    ),
    (
        "scalar_subquery_in_select",  # subquery_scalar select-list, correlated
        """SELECT c_custkey,
                  (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
           FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey""",
    ),
    (
        "multi_column_membership_exists",  # multi-column IN-subquery semantics via correlated EXISTS
        """SELECT n_nationkey, n_name FROM nation
           WHERE EXISTS (SELECT 1 FROM region
                         WHERE r_regionkey = n_regionkey
                           AND r_regionkey = n_nationkey % 5
                           AND r_regionkey < 3)
           ORDER BY n_nationkey""",
    ),
    (
        "exists_with_having_subquery",  # subquery_exists_having.q: EXISTS over an aggregated subquery
        """SELECT n_name FROM nation n
           WHERE EXISTS (SELECT c_nationkey FROM customer c
                         WHERE c.c_nationkey = n.n_nationkey
                         GROUP BY c_nationkey HAVING COUNT(*) >= 4)
           ORDER BY n_name""",
    ),
    (
        "cross_join_small_dims",  # cross_join.q: explicit CROSS JOIN with post-filter
        """SELECT a.r_regionkey, b.r_regionkey AS other
           FROM region a CROSS JOIN region b
           WHERE a.r_regionkey < b.r_regionkey
           ORDER BY a.r_regionkey, other""",
    ),
    (
        "implicit_string_number_compare",  # udf_compare casts: predicate compares number to string literal
        """SELECT o_orderkey FROM orders
           WHERE o_orderkey = '42' OR o_orderkey = '77'
           ORDER BY o_orderkey""",
    ),
    (
        "between_timestamp_literals",  # timestamp comparison range
        """SELECT COUNT(*) AS n, CAST(MIN(event_id) AS BIGINT) AS first_ev
           FROM events
           WHERE ts BETWEEN TIMESTAMP '2024-01-03 00:00:00' AND TIMESTAMP '2024-01-05 00:00:00'""",
    ),
    (
        "in_literal_list_long",  # udf_in.q: long literal IN list + NOT IN
        """SELECT n_nationkey, n_name FROM nation
           WHERE n_nationkey IN (0, 2, 3, 5, 7, 11, 13, 17, 19, 23)
             AND n_nationkey NOT IN (5, 13)
           ORDER BY n_nationkey""",
    ),
    (
        "like_pattern_family",  # udf_like.q: %, _, NOT LIKE combinations
        """SELECT p_partkey, p_name FROM part
           WHERE p_name LIKE '%widget%' AND p_name NOT LIKE 'small%'
             AND p_brand LIKE 'Brand#1_'
           ORDER BY p_partkey LIMIT 40""",
    ),
    (
        "union_then_order_limit",  # union34.q: set op feeding global order+limit
        """SELECT * FROM (
             SELECT n_name AS name FROM nation WHERE n_regionkey = 0
             UNION
             SELECT r_name AS name FROM region
           ) u ORDER BY name LIMIT 12""",
    ),
    (
        "except_of_intersect_chain",  # setop precedence chain with explicit parens
        """SELECT * FROM (
             (SELECT n_regionkey FROM nation WHERE n_nationkey < 15
              INTERSECT
              SELECT n_regionkey FROM nation WHERE n_nationkey >= 5)
             EXCEPT
             SELECT r_regionkey FROM region WHERE r_regionkey = 4
           ) s ORDER BY n_regionkey""",
    ),
    (
        "distinct_star_small",  # distinct_star.q shape on a deduplicable projection
        """SELECT DISTINCT n_regionkey, n_regionkey % 2 AS parity
           FROM nation ORDER BY n_regionkey""",
    ),
    (
        "coalesce_join_key_fallback",  # join on a defaulted key
        """SELECT t.k, COUNT(*) AS n FROM (
             SELECT COALESCE(NULLIF(n_regionkey, 4), -1) AS k FROM nation
           ) t JOIN (SELECT r_regionkey AS k FROM region
                     UNION ALL SELECT -1 AS k FROM region WHERE r_regionkey = 0) d
             ON t.k = d.k
           GROUP BY t.k ORDER BY t.k""",
    ),
    (
        "date_trunc_grouping",  # date_trunc month/day bucketing parity
        """SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS n
           FROM events WHERE event_type = 'purchase'
           GROUP BY CAST(date_trunc('day', ts) AS DATE)
           ORDER BY d LIMIT 20""",
    ),
    (
        "nested_derived_tables_three_deep",  # nested FROM-subquery resolution
        """SELECT k, total FROM (
             SELECT k, CAST(SUM(n) AS BIGINT) AS total FROM (
               SELECT o_orderstatus AS k, COUNT(*) AS n
               FROM (SELECT o_orderstatus FROM orders WHERE o_orderkey < 800) base
               GROUP BY o_orderstatus
             ) mid GROUP BY k
           ) top ORDER BY k""",
    ),
    (
        "group_by_lower_upper_keys",  # case-folded grouping keys
        """SELECT LOWER(c_mktsegment) AS seg, UPPER(c_mktsegment) AS seg_u, COUNT(*) AS n
           FROM customer GROUP BY LOWER(c_mktsegment), UPPER(c_mktsegment)
           ORDER BY seg""",
    ),
    (
        "anti_pattern_not_exists_orders",  # subquery_notexists.q: NOT EXISTS anti-join shape
        """SELECT c_custkey FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
           ORDER BY c_custkey LIMIT 50""",
    ),
    (
        "join_derived_with_window",  # derived table containing a window joined to base
        """SELECT r.n_name, t.rnk
           FROM (SELECT n_nationkey, n_name,
                        RANK() OVER (ORDER BY n_nationkey DESC) AS rnk
                 FROM nation) t
           JOIN nation r ON t.n_nationkey = r.n_nationkey
           WHERE t.rnk <= 8 ORDER BY t.rnk""",
    ),
    (
        "agg_filter_vs_case_equivalence",  # aggregate FILTER and CASE forms side by side
        """SELECT o_orderstatus,
                  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS big_f,
                  COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS big_c
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "select_star_except_rename",  # column pruning through star-with-alias projections
        """SELECT t.*, n_nationkey + 100 AS shifted FROM
           (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1) t
           ORDER BY n_nationkey""",
    ),
]


# Round-4 third tranche: the udf_* string long tail (instr/translate/
# repeat/reverse/ascii/chr/split_part/left/right/levenshtein/
# octet_length), grouping() over rollup, exact DECIMAL arithmetic,
# theta-band joins, EXISTS in the SELECT list, count(col)-vs-count(*)
# null semantics, nested CASE inside aggregates.
QSCRIPTS_R8 = [
    (
        "udf_instr_family",  # udf_instr.q: substring search positions
        """SELECT n_name,
                  INSTR(n_name, 'AN') AS pos_an,
                  INSTR(n_name, 'zz') AS pos_missing
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "udf_translate_repeat_reverse",  # udf_translate.q/udf_repeat.q/udf_reverse.q
        """SELECT r_regionkey,
                  TRANSLATE(r_name, 'AEIOU', 'aeiou') AS de_voweled,
                  REPEAT(r_name, 2) AS doubled,
                  REVERSE(r_name) AS backwards
           FROM region ORDER BY r_regionkey""",
    ),
    (
        "udf_ascii_chr_roundtrip",  # udf_ascii.q: code point extraction and back
        """SELECT n_nationkey, ASCII(n_name) AS first_cp,
                  CHR(ASCII(n_name)) AS first_char
           FROM nation WHERE n_nationkey < 12 ORDER BY n_nationkey""",
    ),
    (
        "udf_split_part_segments",  # split_part over the Brand#NN pattern
        """SELECT p_partkey,
                  SPLIT_PART(p_brand, '#', 1) AS brand_word,
                  SPLIT_PART(p_brand, '#', 2) AS brand_num
           FROM part WHERE p_partkey < 60 ORDER BY p_partkey""",
    ),
    (
        "udf_left_right_slices",  # left/right fixed-width slicing
        """SELECT c_custkey, LEFT(c_name, 8) AS prefix, RIGHT(c_name, 3) AS suffix
           FROM customer WHERE c_custkey < 40 ORDER BY c_custkey""",
    ),
    (
        "udf_levenshtein_distances",  # udf_levenshtein.q: exact integer edit distance
        """SELECT a.r_name AS x, b.r_name AS y, LEVENSHTEIN(a.r_name, b.r_name) AS d
           FROM region a CROSS JOIN region b
           WHERE a.r_regionkey <= b.r_regionkey
           ORDER BY x, y""",
    ),
    (
        "udf_octet_bit_length",  # byte-length functions on ASCII strings
        """SELECT n_nationkey,
                  OCTET_LENGTH(CAST(n_name AS BINARY)) AS octets,
                  BIT_LENGTH(n_name) AS bits
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "rollup_with_grouping_function",  # groupby_rollup1.q + grouping()
        """SELECT COALESCE(l_returnflag, '<all>') AS rf,
                  GROUPING(l_returnflag) AS is_total,
                  COUNT(*) AS n
           FROM lineitem WHERE l_orderkey < 500
           GROUP BY ROLLUP(l_returnflag)
           ORDER BY is_total, rf""",
    ),
    (
        "decimal_exact_arithmetic",  # decimal_precision.q: exact fixed-point math
        """SELECT o_orderkey,
                  CAST(o_totalprice AS DECIMAL(14,2)) + CAST(0.01 AS DECIMAL(14,2)) AS plus_cent,
                  CAST(o_totalprice AS DECIMAL(14,2)) * 2 AS doubled
           FROM orders WHERE o_orderkey < 120 ORDER BY o_orderkey""",
    ),
    (
        "theta_band_join_acctbal",  # non-equi band join: balances within a window
        """SELECT c.c_custkey, s.s_suppkey
           FROM (SELECT * FROM customer WHERE c_custkey < 30) c
           JOIN (SELECT * FROM supplier WHERE s_suppkey < 30) s
             ON s.s_acctbal BETWEEN c.c_acctbal - 100 AND c.c_acctbal + 100
           ORDER BY c.c_custkey, s.s_suppkey""",
    ),
    (
        "exists_as_select_column",  # uncorrelated EXISTS projected as a boolean
        """SELECT r_regionkey,
                  EXISTS(SELECT 1 FROM nation WHERE n_regionkey = 99) AS has_phantom,
                  r_regionkey IN (SELECT n_regionkey FROM nation WHERE n_nationkey < 5) AS has_early
           FROM region ORDER BY r_regionkey""",
    ),
    (
        "count_col_vs_star_nulls",  # count(col) skips NULLs, count(*) doesn't
        """SELECT COUNT(*) AS all_rows,
                  COUNT(o.o_orderkey) AS matched_only,
                  COUNT(*) - COUNT(o.o_orderkey) AS unmatched
           FROM customer c
           LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
             ON c.c_custkey = o.o_custkey""",
    ),
    (
        "nested_case_inside_aggregates",  # conditional aggregation matrix
        """SELECT l_linestatus,
                  CAST(SUM(CASE WHEN l_returnflag = 'R'
                           THEN CASE WHEN l_quantity > 25 THEN 2 ELSE 1 END
                           ELSE 0 END) AS BIGINT) AS weighted_returns,
                  CAST(MIN(CASE WHEN l_discount > 0.05 THEN l_orderkey END) AS BIGINT) AS first_discounted
           FROM lineitem WHERE l_orderkey < 1000
           GROUP BY l_linestatus ORDER BY l_linestatus""",
    ),
    (
        "union_three_branch_distinct",  # union of three sources with global dedup
        """SELECT nk FROM (
             SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9500
             UNION
             SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9500
             UNION
             SELECT n_nationkey AS nk FROM nation WHERE n_regionkey = 2
           ) u ORDER BY nk""",
    ),
    (
        "window_in_subquery_feeding_agg",  # cbo_windowing.q: aggregate over window output
        """SELECT quartile, COUNT(*) AS n, CAST(MIN(c_acctbal) AS DOUBLE) AS floor_bal
           FROM (SELECT c_acctbal, NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
                 FROM customer WHERE c_custkey <= 400) q
           GROUP BY quartile ORDER BY quartile""",
    ),
    (
        "md5_sha_literal_parity",  # udf_md5.q/udf_sha1-shape: digest functions on columns
        """SELECT n_nationkey, MD5(n_name) AS name_md5
           FROM nation WHERE n_nationkey < 8 ORDER BY n_nationkey""",
    ),
]


# Round-4 final tranche: input*/union-numbered/ppd-outer/nested-
# subquery singles with high shape distinctness.
QSCRIPTS_R9 = [
    (
        "input_projection_arithmetic",  # input.q-family: pure projection scan
        """SELECT n_nationkey, n_nationkey + n_regionkey AS k_sum,
                  n_nationkey * n_regionkey AS k_prod, -n_nationkey AS neg
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "join_two_column_keys",  # join with a compound equi-key
        """SELECT COUNT(*) AS n
           FROM (SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_orderkey < 2000) a
           JOIN (SELECT l_orderkey, l_partkey, l_discount FROM lineitem WHERE l_orderkey < 2000) b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey = b.l_partkey""",
    ),
    (
        "union_of_two_joins",  # union22.q: joins on both union branches
        """SELECT kind, COUNT(*) AS n FROM (
             SELECT 'cust_nation' AS kind FROM customer JOIN nation ON c_nationkey = n_nationkey
             WHERE n_regionkey = 0
             UNION ALL
             SELECT 'supp_nation' AS kind FROM supplier JOIN nation ON s_nationkey = n_nationkey
             WHERE n_regionkey = 0
           ) u GROUP BY kind ORDER BY kind""",
    ),
    (
        "having_count_distinct",  # having.q variant: distinct aggregate in HAVING
        """SELECT c_nationkey FROM customer
           GROUP BY c_nationkey
           HAVING COUNT(DISTINCT c_mktsegment) >= 4
           ORDER BY c_nationkey""",
    ),
    (
        "group_by_nullable_key",  # groupby over a key that is NULL for unmatched rows
        """SELECT o.k, COUNT(*) AS n FROM (
             SELECT CASE WHEN o_totalprice > 450000 THEN o_orderstatus END AS k
             FROM orders
           ) o GROUP BY o.k ORDER BY o.k NULLS FIRST""",
    ),
    (
        "self_union_distinct_identity",  # union dedup identity: t UNION t == DISTINCT t
        """SELECT n_regionkey FROM nation
           UNION
           SELECT n_regionkey FROM nation
           ORDER BY n_regionkey""",
    ),
    (
        "window_running_min_and_max",  # two opposing running extremes over one spec
        """SELECT o_orderkey,
                  MIN(o_totalprice) OVER (ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_min,
                  MAX(o_totalprice) OVER (ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
           FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""",
    ),
    (
        "ppd_where_on_right_of_left_join",  # ppd_outer_join2.q: WHERE on the null-extended side
        """SELECT c.c_custkey, o.o_orderkey
           FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
           WHERE o.o_totalprice > 400000
           ORDER BY c.c_custkey, o.o_orderkey LIMIT 60""",
    ),
    (
        "exists_containing_in",  # nested subquery combinators
        """SELECT n_name FROM nation n
           WHERE EXISTS (SELECT 1 FROM supplier s
                         WHERE s.s_nationkey = n.n_nationkey
                           AND s.s_suppkey IN (SELECT l_suppkey FROM lineitem
                                               WHERE l_quantity >= 48))
           ORDER BY n_name""",
    ),
    (
        "boolean_int_cast_lattice",  # cast bool <-> int round trips in projections
        """SELECT n_nationkey,
                  CAST(n_regionkey = 0 AS INT) AS is_r0,
                  CAST(CAST(n_nationkey % 2 AS BOOLEAN) AS INT) AS odd_flag
           FROM nation ORDER BY n_nationkey""",
    ),
]

# Eleventh tranche: syntax families with no prior shape — null-safe
# equality joins, nav-fn defaults, WITHIN GROUP ordered-set aggs,
# OFFSET pagination, ALL set ops, type-coercing unions, correlated
# scalar subqueries in the SELECT list, conditional-function battery.
QSCRIPTS_R10 = [
    (
        "null_safe_equality_join",  # join_nullsafe.q: IS NOT DISTINCT FROM on a derived nullable key
        """SELECT a.o_orderkey, b.o_orderkey AS other_key
           FROM (SELECT o_orderkey, CASE WHEN o_totalprice > 450000 THEN o_orderstatus END AS k
                 FROM orders WHERE o_orderkey <= 80) a
           JOIN (SELECT o_orderkey, CASE WHEN o_totalprice > 450000 THEN o_orderstatus END AS k
                 FROM orders WHERE o_orderkey <= 80) b
             ON a.k IS NOT DISTINCT FROM b.k AND a.o_orderkey < b.o_orderkey
           ORDER BY a.o_orderkey, other_key LIMIT 100""",
    ),
    (
        "window_navfn_defaults",  # windowing_navfn.q: lag/lead with explicit offset+default, nth_value
        """SELECT o_orderkey,
                  LAG(o_totalprice, 2, -1.0) OVER w  AS lag2,
                  LEAD(o_totalprice, 3, -1.0) OVER w AS lead3,
                  NTH_VALUE(o_totalprice, 2) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_seen
           FROM orders WHERE o_orderkey <= 200
           WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
           ORDER BY o_orderkey""",
    ),
    (
        "percentile_cont_within_group",  # udaf_percentile_cont.q: ordered-set aggregate
        """SELECT o_orderstatus,
                  PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS med,
                  PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "limit_offset_pagination",  # offset_limit.q: second page of a stable ordering
        """SELECT o_orderkey, o_totalprice FROM orders
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10""",
    ),
    (
        "ordered_subquery_reordered",  # order-by+limit inside a derived table, outer re-sort
        """SELECT o_orderkey, o_totalprice FROM (
             SELECT o_orderkey, o_totalprice FROM orders
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
           ) top25 ORDER BY o_orderkey""",
    ),
    (
        "union_numeric_type_coercion",  # union cast coercion: int/double/decimal branches unify
        """SELECT kind, SUM(v) AS total FROM (
             SELECT 'i' AS kind, n_nationkey AS v FROM nation
             UNION ALL
             SELECT 'd', n_regionkey + 0.5 FROM nation
             UNION ALL
             SELECT 'c', CAST(n_nationkey AS DECIMAL(10,2)) FROM nation
           ) u GROUP BY kind ORDER BY kind""",
    ),
    (
        "correlated_scalar_in_select",  # subquery_scalar.q: per-row correlated aggregate projection
        """SELECT n_name,
                  (SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS n_supps,
                  (SELECT MAX(c_acctbal) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS top_bal
           FROM nation n ORDER BY n_name""",
    ),
    (
        "conditional_fn_battery",  # udf_if.q family: if/ifnull/nullif/coalesce interplay
        """SELECT n_nationkey,
                  IF(n_regionkey = 0, 'africa', 'other') AS if_out,
                  IFNULL(NULLIF(n_regionkey, 0), -1) AS masked,
                  COALESCE(NULLIF(n_name, 'FRANCE'), 'was-france') AS coal
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "setop_all_variants",  # INTERSECT ALL / EXCEPT ALL keep duplicate multiplicity
        """SELECT v, COUNT(*) AS n FROM (
             SELECT c_nationkey AS v FROM customer WHERE c_custkey <= 600
             INTERSECT ALL
             SELECT c_nationkey FROM customer WHERE c_custkey >= 300 AND c_custkey <= 900
           ) i GROUP BY v
           UNION ALL
           SELECT -1 - v, COUNT(*) FROM (
             SELECT c_nationkey AS v FROM customer WHERE c_custkey <= 600
             EXCEPT ALL
             SELECT c_nationkey FROM customer WHERE c_custkey >= 300 AND c_custkey <= 900
           ) e GROUP BY v
           ORDER BY 1, 2""",
    ),
    (
        "order_by_unprojected_expr",  # sort key is an expression absent from the SELECT list
        """SELECT n_name FROM nation ORDER BY n_nationkey % 5, n_name""",
    ),
    (
        "cross_join_promoted_to_inner",  # explicit CROSS JOIN + WHERE equality == inner join
        """SELECT r.r_name, COUNT(*) AS n
           FROM nation n CROSS JOIN region r
           WHERE n.n_regionkey = r.r_regionkey
           GROUP BY r.r_name ORDER BY r.r_name""",
    ),
    (
        "mixed_equi_theta_on_clause",  # join_cond_pushdown: equi + BETWEEN band in one ON
        """SELECT s.s_suppkey, c.c_custkey
           FROM supplier s JOIN customer c
             ON s.s_nationkey = c.c_nationkey
            AND c.c_acctbal BETWEEN s.s_acctbal - 100 AND s.s_acctbal + 100
           WHERE s.s_suppkey <= 40
           ORDER BY s.s_suppkey, c.c_custkey""",
    ),
]

# Twelfth tranche: USING joins, inline VALUES tables, FILTER-clause
# aggregates, GROUP BY ALL, global HAVING, empty grouping set, LIKE
# ESCAPE, row-value IN subqueries, comma cross joins, simple-form
# CASE, ANSI TRIM, negative modulo truncation.
QSCRIPTS_R11 = [
    (
        "using_join_on_aliased_key",  # join ... USING merges the key column
        """SELECT rk, n_name, r_name FROM
             (SELECT n_regionkey AS rk, n_name FROM nation) n
           JOIN (SELECT r_regionkey AS rk, r_name FROM region) r USING (rk)
           ORDER BY rk, n_name""",
    ),
    (
        "values_inline_table_join",  # VALUES as a derived table joined to real data
        """SELECT t.tier, COUNT(*) AS n
           FROM region r JOIN (VALUES (0, 'old-world'), (1, 'americas'), (2, 'asia'),
                                      (3, 'europe'), (4, 'mideast')) AS t(rk, tier)
             ON r.r_regionkey = t.rk
           JOIN nation n ON n.n_regionkey = r.r_regionkey
           GROUP BY t.tier ORDER BY t.tier""",
    ),
    (
        "filter_clause_aggregates",  # COUNT/SUM ... FILTER (WHERE ...) per group
        """SELECT o_orderstatus,
                  COUNT(*) AS n_all,
                  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                       FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "group_by_all_shorthand",  # GROUP BY ALL infers the non-aggregate columns
        """SELECT n_regionkey, substring(n_name, 1, 1) AS initial, COUNT(*) AS n
           FROM nation GROUP BY ALL ORDER BY n_regionkey, initial""",
    ),
    (
        "having_without_group_by",  # global aggregate gated by HAVING
        """SELECT COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders HAVING COUNT(*) > 10""",
    ),
    (
        "grouping_sets_with_empty_set",  # per-key rows plus a grand total from ()
        """SELECT n_regionkey, COUNT(*) AS n, GROUPING(n_regionkey) AS is_total
           FROM nation GROUP BY GROUPING SETS ((n_regionkey), ())
           ORDER BY is_total, n_regionkey""",
    ),
    (
        "like_escape_clause",  # ESCAPE makes % a literal: only the '50%' tag matches
        """SELECT p_partkey, tagged FROM (
             SELECT p_partkey,
                    CASE WHEN p_partkey % 2 = 0 THEN p_type || ' 50% off'
                         ELSE p_type || ' 50c off' END AS tagged
             FROM part WHERE p_partkey <= 40
           ) t
           WHERE tagged LIKE '%50!%%' ESCAPE '!'
           ORDER BY p_partkey""",
    ),
    (
        "avg_of_rank_subquery",  # aggregate consuming a window function's output
        """SELECT o_orderstatus, AVG(rnk) AS avg_rank, MAX(rnk) AS n_in_group
           FROM (SELECT o_orderstatus,
                        RANK() OVER (PARTITION BY o_orderstatus
                                     ORDER BY o_orderkey) AS rnk
                 FROM orders WHERE o_orderkey <= 500) r
           GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "comma_cross_join_with_where",  # SQL-92 implicit join syntax
        """SELECT n.n_name, r.r_name
           FROM nation n, region r
           WHERE n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
           ORDER BY n.n_name""",
    ),
    (
        "simple_case_expression_form",  # CASE <expr> WHEN <expr> matching (not searched form)
        """SELECT o_orderkey,
                  CASE o_orderstatus WHEN 'F' THEN 'finished'
                                     WHEN 'O' THEN 'open'
                                     ELSE 'partial' END AS status_word,
                  CASE o_orderkey % 3 WHEN 0 THEN 'zero' WHEN 1 THEN 'one' END AS mod_word
           FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""",
    ),
    (
        "ansi_trim_variants",  # TRIM(BOTH/LEADING/TRAILING ch FROM s)
        """SELECT n_nationkey,
                  TRIM(BOTH 'A' FROM n_name)     AS both_a,
                  TRIM(LEADING 'A' FROM n_name)  AS lead_a,
                  TRIM(TRAILING 'A' FROM n_name) AS trail_a
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "negative_mod_truncation",  # % truncates toward zero on negative operands
        """SELECT n_nationkey,
                  (n_nationkey - 12) % 5       AS neg_mod,
                  -(n_nationkey) % 7           AS neg_operand,
                  (n_nationkey - 12) / 5       AS div_out
           FROM nation ORDER BY n_nationkey""",
    ),
]

# Thirteenth tranche: temporal extraction/construction, boolean and
# bitwise aggregates, LATERAL correlated derived tables, IN-list
# three-valued logic, regexp group extraction, subquery combinators.
QSCRIPTS_R12 = [
    (
        "extract_battery",  # EXTRACT fields off event timestamps
        """SELECT EXTRACT(year FROM ts) AS y, EXTRACT(month FROM ts) AS m,
                  EXTRACT(day FROM ts) AS d, EXTRACT(hour FROM ts) AS h,
                  COUNT(*) AS n
           FROM events GROUP BY 1, 2, 3, 4
           ORDER BY y, m, d, h LIMIT 50""",
    ),
    (
        "make_date_last_day",  # date construction + month-end
        """SELECT n_nationkey,
                  make_date(2024, CAST(n_nationkey % 12 + 1 AS INT), 15) AS mid_month,
                  last_day(make_date(2024, CAST(n_nationkey % 12 + 1 AS INT), 15)) AS month_end
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "interval_month_end_clamp",  # +1 MONTH clamps Jan 31 -> Feb 29 (leap year);
        # CASTs because DuckDB promotes date+interval to timestamp while Spark keeps DATE
        """SELECT d, CAST(d + INTERVAL 1 MONTH AS DATE) AS plus_month,
                  CAST(d + INTERVAL 3 DAY AS DATE) AS plus_days
           FROM (SELECT make_date(2024, 1, CAST(27 + r_regionkey AS INT)) AS d
                 FROM region) t
           ORDER BY d""",
    ),
    (
        "bool_and_or_aggregates",  # BOOL_AND / BOOL_OR per group
        """SELECT n_regionkey,
                  BOOL_AND(n_nationkey > 2)  AS all_gt2,
                  BOOL_OR(n_nationkey > 20)  AS any_gt20
           FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    ),
    (
        "bitwise_and_or_masks",  # & and | operators in projections and filters
        """SELECT n_nationkey,
                  n_nationkey & 7 AS low_bits,
                  n_nationkey | 16 AS with_flag
           FROM nation WHERE (n_nationkey & 1) = 1
           ORDER BY n_nationkey""",
    ),
    (
        "in_list_with_null_semantics",  # x IN (..., NULL) is NULL when unmatched
        """SELECT
             CAST(SUM(CASE WHEN n_nationkey IN (1, 2, NULL) THEN 1 ELSE 0 END) AS BIGINT) AS matched,
             CAST(SUM(CASE WHEN (n_nationkey IN (1, 2, NULL)) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unknown,
             CAST(SUM(CASE WHEN n_nationkey NOT IN (1, 2, NULL) THEN 1 ELSE 0 END) AS BIGINT) AS anti_matched
           FROM nation""",
    ),
    (
        "lateral_correlated_derived_table",  # JOIN LATERAL referencing the outer row
        """SELECT n.n_name, t.n_supps
           FROM nation n JOIN LATERAL (
             SELECT COUNT(*) AS n_supps FROM supplier s
             WHERE s.s_nationkey = n.n_nationkey
           ) t ON TRUE
           ORDER BY n.n_name""",
    ),
    (
        "exists_with_limit_inside",  # LIMIT inside EXISTS does not change truth
        """SELECT r_name FROM region r
           WHERE EXISTS (SELECT 1 FROM nation n
                         WHERE n.n_regionkey = r.r_regionkey
                         ORDER BY n.n_nationkey LIMIT 1)
           ORDER BY r_name""",
    ),
    (
        "union_all_inside_in_subquery",  # set op as the IN source
        """SELECT n_name FROM nation
           WHERE n_nationkey IN (SELECT n_regionkey FROM nation
                                 UNION ALL
                                 SELECT r_regionkey + 20 FROM region)
           ORDER BY n_name""",
    ),
    (
        "regexp_extract_group",  # capture-group extraction, shared Java/RE2 subset
        """SELECT o_orderkey,
                  regexp_extract(o_orderpriority, '([0-9])-([A-Z]+)', 1) AS prio_num,
                  regexp_extract(o_orderpriority, '([0-9])-([A-Z]+)', 2) AS prio_word
           FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey""",
    ),
    (
        "not_between_chain",  # NOT BETWEEN composed with AND/OR
        """SELECT COUNT(*) AS n_outside,
                  CAST(SUM(CASE WHEN o_totalprice NOT BETWEEN 100000 AND 400000
                                 AND o_orderkey NOT BETWEEN 50 AND 500
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_both_outside
           FROM orders WHERE o_totalprice NOT BETWEEN 150000 AND 300000""",
    ),
    (
        "coalesce_scalar_subquery_fallback",  # scalar subquery inside COALESCE
        """SELECT r_name,
                  COALESCE((SELECT MAX(n_nationkey) FROM nation n
                            WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey > 90),
                           -1) AS top_or_default
           FROM region r ORDER BY r_name""",
    ),
]

# Fourteenth tranche: negative-offset substr, contains/position,
# ||-concat coercion, exact math battery, least/greatest, the
# pre-window top-k self-join idiom, correlated EXISTS with HAVING,
# LIMIT inside IN, chained scalar subqueries, ORDER+LIMIT over a
# whole union, repeat chains, manual CASE pivot.
QSCRIPTS_R13 = [
    (
        "substr_negative_start",  # negative offset counts from the end
        """SELECT n_nationkey, substr(n_name, -3) AS last3,
                  substr(n_name, 2, 3) AS mid3
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "contains_and_position",  # contains() + ANSI POSITION(sub IN s)
        """SELECT n_nationkey, n_name,
                  contains(n_name, 'AN') AS has_an,
                  position('A' IN n_name) AS first_a
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "pipe_concat_mixed_types",  # || coerces numerics to strings
        """SELECT n_nationkey, n_name || '-' || n_nationkey || '/' || n_regionkey AS tag
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "math_fn_battery",  # exact-valued math functions on integers
        """SELECT n_nationkey,
                  abs(n_nationkey - 12)                     AS centered,
                  CAST(sign(n_nationkey - 12) AS BIGINT)    AS trend,
                  CAST(floor(n_nationkey / 4.0) AS BIGINT)  AS fl,
                  CAST(ceiling(n_nationkey / 4.0) AS BIGINT) AS ce,
                  sqrt(CAST(n_nationkey * n_nationkey AS DOUBLE)) AS root,
                  power(2, CAST(n_nationkey % 10 AS DOUBLE))      AS pow2
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "least_greatest_nonnull",  # least/greatest over non-null ints
        """SELECT n_nationkey,
                  least(n_nationkey, n_regionkey * 5, 10)    AS lo,
                  greatest(n_nationkey, n_regionkey * 5, 10) AS hi
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "topk_per_group_inequality_selfjoin",  # pre-window top-k idiom: count strictly-greater peers
        """SELECT a.o_orderstatus, a.o_orderkey, a.o_totalprice
           FROM orders a
           WHERE a.o_orderkey <= 400
             AND (SELECT COUNT(*) FROM orders b
                  WHERE b.o_orderkey <= 400
                    AND b.o_orderstatus = a.o_orderstatus
                    AND b.o_totalprice > a.o_totalprice) < 3
           ORDER BY a.o_orderstatus, a.o_totalprice DESC, a.o_orderkey""",
    ),
    (
        "exists_correlated_group_having",  # EXISTS over a grouped+HAVING subquery
        """SELECT c_custkey FROM customer c
           WHERE c_custkey <= 200
             AND EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                         GROUP BY o.o_custkey HAVING COUNT(*) >= 12)
           ORDER BY c_custkey""",
    ),
    (
        "in_subquery_with_limit",  # LIMIT inside the IN source
        # o_orderkey tiebreak: a totalprice tie at the LIMIT boundary
        # would otherwise let Spark and DuckDB pick different key sets
        # (ADVICE r5).
        """SELECT n_name FROM nation
           WHERE n_nationkey IN (SELECT o_custkey % 25 FROM orders
                                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
           ORDER BY n_name""",
    ),
    (
        "nested_scalar_subqueries",  # a scalar subquery inside another's predicate
        """SELECT r_name,
                  (SELECT COUNT(*) FROM nation n
                   WHERE n.n_regionkey = r.r_regionkey
                     AND n.n_nationkey > (SELECT AVG(n2.n_nationkey) FROM nation n2)
                  ) AS above_avg_nations
           FROM region r ORDER BY r_name""",
    ),
    (
        "union_whole_order_limit",  # ORDER BY + LIMIT applied to the whole union
        """SELECT v FROM (
             SELECT n_nationkey AS v FROM nation
             UNION ALL
             SELECT r_regionkey + 100 FROM region
           ) u ORDER BY v DESC LIMIT 7""",
    ),
    (
        "repeat_upper_lower_chain",  # string builder chain
        """SELECT n_nationkey,
                  repeat(lower(substr(n_name, 1, 2)), 3) AS tripled,
                  length(repeat(n_name, CAST(n_nationkey % 3 AS INT))) AS rep_len
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "manual_case_pivot",  # SUM(CASE) pivot of status counts into columns
        """SELECT c_nationkey,
                  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
                  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
           FROM customer JOIN orders ON o_custkey = c_custkey
           GROUP BY c_nationkey ORDER BY c_nationkey""",
    ),
]

# Fifteenth tranche: empty-OVER global windows, mixed window specs,
# DAG-shaped CTE reuse, computed join keys, ILIKE, EXCEPT-as-anti,
# timestamp BETWEEN, QUALIFY-substitute filtering on a window count.
QSCRIPTS_R14 = [
    (
        "global_window_share",  # share of the grand total via SUM(n) OVER ()
        """SELECT n_regionkey, n,
                  CAST(n AS DOUBLE) / SUM(n) OVER () AS share
           FROM (SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey) g
           ORDER BY n_regionkey""",
    ),
    (
        "multi_partition_window_specs",  # two different PARTITION BYs in one SELECT
        """SELECT o_orderkey,
                  ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn_status,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS rn_prio
           FROM orders WHERE o_orderkey <= 150 ORDER BY o_orderkey""",
    ),
    (
        "cte_dag_two_consumers",  # one CTE feeding two later CTEs that then join
        """WITH base AS (
             SELECT n_regionkey, n_nationkey FROM nation
           ),
           lows AS (SELECT n_regionkey, MIN(n_nationkey) AS lo FROM base GROUP BY n_regionkey),
           highs AS (SELECT n_regionkey, MAX(n_nationkey) AS hi FROM base GROUP BY n_regionkey)
           SELECT l.n_regionkey, l.lo, h.hi, h.hi - l.lo AS spread
           FROM lows l JOIN highs h ON l.n_regionkey = h.n_regionkey
           ORDER BY l.n_regionkey""",
    ),
    (
        "join_on_computed_expression",  # equi key that is a function of both sides
        """SELECT n.n_nationkey, r.r_regionkey, COUNT(*) AS n
           FROM nation n JOIN region r ON n.n_nationkey % 5 = r.r_regionkey
           GROUP BY n.n_nationkey, r.r_regionkey
           ORDER BY n.n_nationkey""",
    ),
    (
        "having_or_of_aggregates",  # disjunction of aggregate predicates
        """SELECT c_nationkey, COUNT(*) AS n, MAX(c_acctbal) AS top
           FROM customer GROUP BY c_nationkey
           HAVING COUNT(*) > 40 OR MAX(c_acctbal) > 9990
           ORDER BY c_nationkey""",
    ),
    (
        "order_by_aggregate_alias",  # sort on the SELECT-list alias of an aggregate
        """SELECT o_orderstatus, COUNT(*) AS n_orders
           FROM orders GROUP BY o_orderstatus
           ORDER BY n_orders DESC, o_orderstatus""",
    ),
    (
        "ilike_case_insensitive",  # ILIKE matches the uppercase names from a lowercase pattern
        """SELECT n_nationkey, n_name FROM nation
           WHERE n_name ILIKE 'nation_1%'
           ORDER BY n_nationkey""",
    ),
    (
        "except_as_antijoin_on_keys",  # EXCEPT on the key column == anti join
        """SELECT v AS n_nationkey FROM (
             SELECT n_nationkey AS v FROM nation
             EXCEPT
             SELECT n_regionkey FROM nation
           ) a ORDER BY n_nationkey""",
    ),
    (
        "timestamp_between_literals",  # event-time BETWEEN timestamp literals
        """SELECT event_type, COUNT(*) AS n
           FROM events
           WHERE ts BETWEEN TIMESTAMP '2024-01-02 00:00:00' AND TIMESTAMP '2024-01-03 12:00:00'
           GROUP BY event_type ORDER BY event_type""",
    ),
    (
        "qualify_substitute_window_filter",  # filter on a window COUNT in an outer query
        """SELECT o_orderstatus, o_orderkey FROM (
             SELECT o_orderstatus, o_orderkey,
                    COUNT(*) OVER (PARTITION BY o_orderstatus) AS status_n
             FROM orders WHERE o_orderkey <= 300
           ) w WHERE status_n >= 20
           ORDER BY o_orderstatus, o_orderkey LIMIT 50""",
    ),
    (
        "distinct_order_limit_expression",  # DISTINCT + sort on a derived expression
        """SELECT DISTINCT c_nationkey * 2 AS doubled
           FROM customer ORDER BY doubled DESC LIMIT 8""",
    ),
    (
        "left_join_chain_null_propagation",  # b misses -> c side stays NULL, COALESCE defaults
        """SELECT c.c_custkey,
                  COALESCE(o.o_orderstatus, 'none') AS status,
                  COALESCE(l.n_li, 0) AS n_li
           FROM customer c
           LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
             ON o.o_custkey = c.c_custkey
           LEFT JOIN (SELECT l_orderkey, COUNT(*) AS n_li FROM lineitem GROUP BY l_orderkey) l
             ON l.l_orderkey = o.o_orderkey
           WHERE c.c_custkey <= 80
           ORDER BY c.c_custkey, status, n_li""",
    ),
]

# Sixteenth tranche: WITH RECURSIVE (series + reachability), TRY_CAST,
# EXISTS inside CASE, parenthesized set-op precedence, LATERAL top-1
# per group, string->date casts, ordinal/expression GROUP BY mix.
QSCRIPTS_R15 = [
    (
        "recursive_cte_series_join",  # WITH RECURSIVE series joined to data
        """WITH RECURSIVE series(n) AS (
             SELECT 0
             UNION ALL
             SELECT n + 1 FROM series WHERE n < 4
           )
           SELECT s.n AS region, COUNT(*) AS n_nations
           FROM series s JOIN nation ON n_regionkey = s.n
           GROUP BY s.n ORDER BY s.n""",
    ),
    (
        "recursive_cte_reachability",  # transitive closure over a derived parent tree;
        # FLOOR because CAST(1.5 AS INT) truncates on Spark but rounds on DuckDB
        """WITH RECURSIVE reach(k) AS (
             SELECT 24
             UNION ALL
             SELECT CAST(FLOOR(k / 2) AS INT) FROM reach WHERE k > 0
           )
           SELECT n_nationkey, n_name FROM nation
           WHERE n_nationkey IN (SELECT k FROM reach)
           ORDER BY n_nationkey""",
    ),
    (
        "try_cast_battery",  # TRY_CAST returns NULL instead of raising
        """SELECT n_nationkey,
                  TRY_CAST(n_name AS INT)                     AS bad_int,
                  TRY_CAST(CAST(n_nationkey AS STRING) AS INT) AS good_int,
                  TRY_CAST('not-a-date' AS DATE)              AS bad_date
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "exists_inside_case",  # EXISTS as a CASE branch condition
        """SELECT r_name,
                  CASE WHEN EXISTS (SELECT 1 FROM nation n
                                    WHERE n.n_regionkey = r.r_regionkey
                                      AND n.n_nationkey > 20)
                       THEN 'has-high' ELSE 'low-only' END AS tag
           FROM region r ORDER BY r_name""",
    ),
    (
        "parenthesized_setop_precedence",  # explicit parens change set-op grouping
        """SELECT v FROM (
             (SELECT n_nationkey AS v FROM nation WHERE n_nationkey < 10
              UNION ALL
              SELECT n_nationkey FROM nation WHERE n_nationkey < 5)
             INTERSECT
             SELECT n_nationkey FROM nation WHERE n_nationkey BETWEEN 3 AND 12
           ) t ORDER BY v""",
    ),
    (
        "lateral_top1_per_group",  # greatest-per-group via LATERAL ORDER BY LIMIT 1
        """SELECT r.r_name, t.top_nation
           FROM region r JOIN LATERAL (
             SELECT n_name AS top_nation FROM nation n
             WHERE n.n_regionkey = r.r_regionkey
             ORDER BY n.n_nationkey DESC LIMIT 1
           ) t ON TRUE
           ORDER BY r.r_name""",
    ),
    (
        "string_to_date_cast_arithmetic",  # CAST string literals to DATE + arithmetic
        """SELECT n_nationkey,
                  CAST('2024-03-05' AS DATE) AS base_day,
                  CAST(CAST('2024-03-05' AS DATE) + INTERVAL 1 DAY * n_nationkey AS DATE) AS shifted
           FROM nation WHERE n_nationkey < 10 ORDER BY n_nationkey""",
    ),
    (
        "group_by_ordinal_expr_mix",  # ordinal and expression in one GROUP BY
        """SELECT o_orderstatus, o_orderkey % 3 AS k3, COUNT(*) AS n
           FROM orders GROUP BY 1, o_orderkey % 3
           ORDER BY o_orderstatus, k3""",
    ),
    (
        "distinct_count_over_union",  # COUNT(DISTINCT) above a union of key sets
        """SELECT COUNT(DISTINCT v) AS n_keys FROM (
             SELECT n_nationkey AS v FROM nation
             UNION ALL
             SELECT r_regionkey FROM region
           ) u""",
    ),
    (
        "case_in_order_by",  # CASE expression as a sort key
        """SELECT n_nationkey, n_name FROM nation
           ORDER BY CASE WHEN n_regionkey = 2 THEN 0 ELSE 1 END, n_nationkey
           LIMIT 12""",
    ),
    (
        "having_on_grouped_expression",  # HAVING references the grouped expression itself
        """SELECT n_nationkey % 5 AS bucket, COUNT(*) AS n
           FROM nation GROUP BY n_nationkey % 5
           HAVING n_nationkey % 5 >= 2
           ORDER BY bucket""",
    ),
    (
        "row_number_global_order",  # window with ORDER BY only (single partition)
        """SELECT rn, o_orderkey FROM (
             SELECT o_orderkey,
                    ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
             FROM orders
           ) t WHERE rn <= 10 ORDER BY rn""",
    ),
]

# Seventeenth tranche: CUBE syntax, interval RANGE frames on event
# time, exact integer median, ||-NULL propagation, count flavors over
# nullables, alias shadowing across derived-table depths, chained
# INTERSECT, windows over join output, substr edge offsets, pure
# cartesian.
QSCRIPTS_R16 = [
    (
        "cube_syntax_two_cols",  # GROUP BY CUBE(a, b) — all four grouping sets
        """SELECT n_regionkey, n_nationkey % 2 AS parity, COUNT(*) AS n,
                  GROUPING(n_regionkey) AS g_r, GROUPING(n_nationkey % 2) AS g_p
           FROM nation GROUP BY CUBE(n_regionkey, n_nationkey % 2)
           ORDER BY g_r, g_p, n_regionkey, parity""",
    ),
    (
        "interval_range_frame_events",  # RANGE frame bounded by a time interval
        """SELECT event_id, ts,
                  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                    AS n_last_hour
           FROM events WHERE user_id <= 3
           ORDER BY user_id, ts, event_id LIMIT 120""",
    ),
    (
        "median_exact_group",  # MEDIAN over integers per group
        """SELECT o_orderstatus,
                  median(CAST(o_orderkey AS BIGINT)) AS med_key,
                  COUNT(*) AS n
           FROM orders WHERE o_orderkey <= 1001
           GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "pipe_concat_null_propagation",  # || propagates NULL (unlike DuckDB's concat())
        """SELECT n_nationkey,
                  n_name || CASE WHEN n_regionkey = 0 THEN NULL ELSE '-ok' END AS tagged
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "count_flavors_nullable",  # count(*) vs count(1) vs count(col) on a nullable
        """SELECT COUNT(*) AS all_rows, COUNT(1) AS one_rows,
                  COUNT(CASE WHEN o_orderkey % 4 = 0 THEN o_orderkey END) AS non_null_only
           FROM orders WHERE o_orderkey <= 400""",
    ),
    (
        "alias_shadowing_depths",  # same alias name reused at nested depths
        """SELECT t.k, t.n FROM (
             SELECT k, COUNT(*) AS n FROM (
               SELECT n_regionkey AS k FROM nation
             ) t GROUP BY k
           ) t ORDER BY t.k""",
    ),
    (
        "chained_intersect",  # three-way INTERSECT
        """SELECT v FROM (
             SELECT n_nationkey AS v FROM nation WHERE n_nationkey < 20
             INTERSECT
             SELECT n_nationkey FROM nation WHERE n_nationkey >= 5
             INTERSECT
             SELECT n_nationkey FROM nation WHERE n_nationkey % 2 = 1
           ) t ORDER BY v""",
    ),
    (
        "window_over_join_result",  # rank within a joined frame
        """SELECT r_name, n_name,
                  ROW_NUMBER() OVER (PARTITION BY r_name ORDER BY n_nationkey DESC) AS rn
           FROM nation JOIN region ON n_regionkey = r_regionkey
           ORDER BY r_name, rn""",
    ),
    (
        "substr_out_of_range_edges",  # offsets past the end and oversized lengths
        """SELECT n_nationkey,
                  substr(n_name, 100)     AS past_end,
                  substr(n_name, 3, 100)  AS long_len,
                  substr(n_name, 1, 0)    AS zero_len
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "pure_cartesian_count",  # explicit cross product cardinality
        """SELECT COUNT(*) AS n_pairs,
                  CAST(SUM(CAST(n_nationkey + r_regionkey AS BIGINT)) AS BIGINT) AS key_sum
           FROM nation CROSS JOIN region""",
    ),
]


# Eighteenth tranche: GROUP BY ALL, any_value over functionally-
# determined groups, EXISTS as a projected boolean, COUNT(DISTINCT
# CASE), HAVING with no GROUP BY, scalar-subquery arithmetic in
# WHERE, UNION type widening, CASE as a grouping key, timestamp
# INTERVAL arithmetic in a predicate, windowing over aggregate
# output, bounded self-join pair counting, TRIM(BOTH chars FROM).
QSCRIPTS_R17 = [
    (
        "group_by_all",  # modern GROUP BY ALL (beyond-ref portable syntax,
        # same plan as groupby1.q's explicit key list)
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
           FROM orders GROUP BY ALL ORDER BY o_orderstatus, o_orderpriority""",
    ),
    (
        "any_value_determined",  # udaf family: any_value is deterministic when
        # the group functionally determines the value (region name per key)
        """SELECT n_regionkey, any_value(r_name) AS rname, COUNT(*) AS n
           FROM nation JOIN region ON n_regionkey = r_regionkey
           GROUP BY n_regionkey ORDER BY n_regionkey""",
    ),
    (
        "exists_in_select_list",  # subquery_exists.q variant: EXISTS projected
        # as a boolean column instead of filtering
        """SELECT s_suppkey,
                  EXISTS (SELECT 1 FROM lineitem
                          WHERE l_suppkey = s_suppkey AND l_quantity >= 49) AS has_bulk
           FROM supplier s ORDER BY s_suppkey""",
    ),
    (
        "count_distinct_case",  # count.q: DISTINCT over a CASE-projected key
        """SELECT COUNT(DISTINCT CASE WHEN o_totalprice > 150000 THEN o_custkey END)
                    AS big_spenders,
                  COUNT(*) AS n_orders
           FROM orders""",
    ),
    (
        "having_no_groupby",  # having.q: global aggregate gated by HAVING
        """SELECT COUNT(*) AS n FROM orders HAVING COUNT(*) > 10""",
    ),
    (
        "scalar_subquery_arith",  # subquery_scalar.q: subquery result used in
        # arithmetic inside the predicate
        """SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders) / 1.1
           ORDER BY o_orderkey""",
    ),
    (
        "union_type_widening",  # implicit-cast family: INT branch widens to
        # DOUBLE across UNION ALL, names from the first branch
        """SELECT v FROM (
             SELECT n_nationkey AS v FROM nation
             UNION ALL SELECT CAST(r_regionkey AS DOUBLE) FROM region
           ) u ORDER BY v""",
    ),
    (
        "case_as_group_key",  # groupby_ppr-style expression grouping key
        """SELECT CASE WHEN o_totalprice < 50000 THEN 'S'
                       WHEN o_totalprice < 200000 THEN 'M'
                       ELSE 'L' END AS band,
                  COUNT(*) AS n
           FROM orders
           GROUP BY CASE WHEN o_totalprice < 50000 THEN 'S'
                         WHEN o_totalprice < 200000 THEN 'M'
                         ELSE 'L' END
           ORDER BY band""",
    ),
    (
        "interval_arith_predicate",  # interval_arithmetic.q: ts + INTERVAL
        # compared against a literal inside WHERE
        """SELECT event_id, ts FROM events
           WHERE ts + INTERVAL 2 HOUR < TIMESTAMP '2024-01-02 00:00:00'
             AND user_id = 1
           ORDER BY event_id LIMIT 20""",
    ),
    (
        "window_after_groupby",  # windowing_gby.q: rank computed over the
        # aggregate's output in the same query block
        """SELECT o_orderstatus, COUNT(*) AS n,
                  RANK() OVER (ORDER BY COUNT(*) DESC) AS popularity
           FROM orders GROUP BY o_orderstatus ORDER BY popularity, o_orderstatus""",
    ),
    (
        "self_join_pair_count",  # self_join family: within-key ordered pairs
        """SELECT a.o_custkey, COUNT(*) AS n_pairs
           FROM orders a JOIN orders b
             ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
           WHERE a.o_custkey <= 50
           GROUP BY a.o_custkey ORDER BY a.o_custkey""",
    ),
    (
        "trim_both_chars",  # udf_trim.q: character-set TRIM with BOTH
        """SELECT n_nationkey, TRIM(BOTH 'AEIOU' FROM n_name) AS trimmed
           FROM nation ORDER BY n_nationkey""",
    ),
]


# Nineteenth tranche: ordinal GROUP/ORDER BY, EXCEPT ALL /
# INTERSECT ALL bag semantics, LIKE ... ESCAPE, ILIKE, three-arg
# LAG with default, NTH_VALUE with a running frame, date_part on
# event time, position(x IN s), left/right, IEEE-exact sqrt,
# row-tuple IN over a literal list, and CASE with no ELSE.
# (FIRST_VALUE ... IGNORE NULLS was prototyped and dropped: Spark
# puts IGNORE NULLS after the call, DuckDB inside the argument list
# — no single text parses on both engines.)
QSCRIPTS_R18 = [
    (
        "order_group_by_ordinal",  # groupby_position.q: 1-based ordinals in
        # both GROUP BY and ORDER BY
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
           FROM orders GROUP BY 1, 2 ORDER BY 2, 1""",
    ),
    (
        "except_all_bag",  # setop family: EXCEPT ALL keeps multiplicity
        # (each region key removes ONE of its five nation occurrences)
        """SELECT v FROM (
             SELECT n_regionkey AS v FROM nation
             EXCEPT ALL SELECT r_regionkey FROM region
           ) t ORDER BY v""",
    ),
    (
        "intersect_all_bag",  # INTERSECT ALL: min(multiplicity) per value
        """SELECT v FROM (
             SELECT n_regionkey AS v FROM nation
             INTERSECT ALL SELECT n_regionkey FROM nation WHERE n_nationkey < 10
           ) t ORDER BY v""",
    ),
    (
        "like_escape_nation_underscore",  # udf_like.q: ESCAPE makes _ literal (nation names
        # contain a real underscore)
        """SELECT n_nationkey, n_name FROM nation
           WHERE n_name LIKE 'NATION!_1%' ESCAPE '!' ORDER BY n_nationkey""",
    ),
    (
        "ilike_escape",  # case-insensitive LIKE with the same escape
        """SELECT n_nationkey, n_name FROM nation
           WHERE n_name ILIKE 'nation!_2%' ESCAPE '!' ORDER BY n_nationkey""",
    ),
    (
        "lag_with_default",  # windowing.q: three-arg LAG fills leading rows
        """SELECT o_orderkey,
                  LAG(o_totalprice, 2, 0.0) OVER (ORDER BY o_orderkey) AS lag2
           FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""",
    ),
    (
        "nth_value_running",  # windowing_navfn.q: NTH_VALUE under a growing
        # frame is NULL until the frame holds 3 rows
        """SELECT c_custkey, c_mktsegment,
                  NTH_VALUE(c_custkey, 3) OVER (
                    PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_key
           FROM customer WHERE c_custkey <= 200 ORDER BY c_mktsegment, c_custkey""",
    ),
    (
        "date_part_fn",  # udf 'date_part' spelling shared by both engines
        """SELECT event_id, date_part('year', ts) AS y, date_part('hour', ts) AS h
           FROM events WHERE event_id <= 40 ORDER BY event_id""",
    ),
    (
        "position_in_string",  # udf_instr.q: ANSI position(needle IN hay)
        """SELECT n_nationkey, position('A' IN n_name) AS pos_a
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "left_right_slices",  # udf_substr.q: left()/right() shorthands
        """SELECT n_nationkey, left(n_name, 3) AS l3, right(n_name, 3) AS r3
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "sqrt_ieee_exact",  # udf_sqrt.q: sqrt is correctly rounded per IEEE
        # 754, so DOUBLE results are bit-identical cross-engine
        """SELECT o_orderkey, sqrt(CAST(o_orderkey AS DOUBLE)) AS root
           FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey""",
    ),
    (
        "tuple_in_literal_list",  # row-constructor IN over literal tuples
        """SELECT n_nationkey, n_regionkey FROM nation
           WHERE (n_regionkey, n_nationkey % 2) IN ((0, 1), (3, 0))
           ORDER BY n_nationkey""",
    ),
    (
        "case_no_else_null",  # udf_case.q: missing ELSE yields NULL
        """SELECT o_orderkey, CASE WHEN o_totalprice > 300000 THEN 'big' END AS tag
           FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""",
    ),
]


# Twentieth tranche: ANSI EXTRACT fields (DOW deliberately avoided —
# Spark numbers Sunday=1, DuckDB Sunday=0, a real divergence), month
# truncation cast to DATE (Spark's date_trunc yields TIMESTAMP,
# DuckDB's yields DATE — the cast is the portable spelling),
# timestamp→date cast comparison, concat_ws, NULLIF division guard,
# GREATEST null-skipping, date BETWEEN, HAVING referencing a SELECT
# alias, DISTINCT+ORDER BY, ordered-LIMIT derived table, UNION
# inside an IN subquery, chr/ascii round-trip.
QSCRIPTS_R19 = [
    (
        "extract_ansi_fields",  # udf_extract family: EXTRACT(f FROM ts)
        """SELECT event_id, EXTRACT(YEAR FROM ts) AS y, EXTRACT(DAY FROM ts) AS d,
                  EXTRACT(HOUR FROM ts) AS h
           FROM events WHERE event_id <= 30 ORDER BY event_id""",
    ),
    (
        "date_trunc_month_agg",  # date_trunc month rollup, DATE-cast portable
        """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, COUNT(*) AS n
           FROM orders GROUP BY 1 ORDER BY m LIMIT 24""",
    ),
    (
        "cast_ts_to_date_compare",  # timestamp→date cast in a predicate
        """SELECT event_id FROM events
           WHERE CAST(ts AS DATE) = DATE '2024-01-03' ORDER BY event_id LIMIT 25""",
    ),
    (
        "concat_ws_fn",  # udf_concat_ws.q
        """SELECT n_nationkey,
                  concat_ws('-', n_name, CAST(n_regionkey AS STRING)) AS tag
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "nullif_div_guard",  # the NULLIF(x,0) divide-by-zero idiom
        """SELECT o_orderkey, o_totalprice / NULLIF(o_orderkey % 3, 0) AS ratio
           FROM orders WHERE o_orderkey <= 50 ORDER BY o_orderkey""",
    ),
    (
        "greatest_null_skipping",  # GREATEST skips NULL args on both engines
        """SELECT n_nationkey, GREATEST(n_nationkey, NULL, n_regionkey) AS g
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "between_dates",  # date-literal BETWEEN range predicate
        """SELECT COUNT(*) AS n FROM orders
           WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'""",
    ),
    (
        "having_alias_reference",  # HAVING may reference the SELECT alias
        """SELECT o_orderstatus, COUNT(*) AS n FROM orders
           GROUP BY o_orderstatus HAVING n > 100 ORDER BY o_orderstatus""",
    ),
    (
        "distinct_with_orderby",  # DISTINCT then ORDER BY the same column
        """SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority""",
    ),
    (
        "derived_orderby_limit",  # ordered LIMIT inside a derived table is
        # preserved before the outer reorder
        """SELECT k, p FROM (
             SELECT o_orderkey AS k, o_totalprice AS p FROM orders
             ORDER BY p DESC, k LIMIT 10
           ) t ORDER BY k""",
    ),
    (
        "union_in_where_subquery",  # IN over a UNION'd subquery
        """SELECT n_name FROM nation WHERE n_regionkey IN (
             SELECT r_regionkey FROM region WHERE r_name = 'ASIA'
             UNION SELECT 0
           ) ORDER BY n_name""",
    ),
    (
        "chr_ascii_roundtrip",  # udf_ascii.q / udf_chr: code point round-trip
        """SELECT n_nationkey, ascii(n_name) AS first_code,
                  chr(ascii(n_name)) AS first_char
           FROM nation ORDER BY n_nationkey""",
    ),
]


# Twenty-first tranche: simple-form CASE, a 40-element IN list,
# forward-only ROWS frames, LAG under DESC ordering, the
# QUALIFY-style filter-on-windowed-derived-table, a CTE referenced
# twice, AVG(DISTINCT expr), MIN/MAX over strings, LIMIT+OFFSET,
# HAVING on GROUPING(), date-interval RANGE frames, and COALESCE
# over a NULLIF chain.
QSCRIPTS_R20 = [
    (
        "simple_case_form",  # udf_case.q: CASE expr WHEN v THEN (simple form)
        """SELECT o_orderkey,
                  CASE o_orderstatus WHEN 'F' THEN 'finished'
                                     WHEN 'O' THEN 'open'
                                     ELSE 'partial' END AS st
           FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey""",
    ),
    (
        "long_in_list",  # the IN-list shape Hive turns into a hash set
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_suppkey IN (1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,
                               19,20,21,22,23,24,25,26,27,28,29,30,31,32,33,
                               34,35,36,37,38,39,40)""",
    ),
    (
        "rows_following_frame",  # windowing_windowspec.q: forward-only frame
        """SELECT o_orderkey,
                  SUM(o_totalprice) OVER (ORDER BY o_orderkey
                    ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS nxt2
           FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey""",
    ),
    (
        "lag_desc_order",  # LAG over a DESC ordering = successor access
        """SELECT o_orderkey,
                  LAG(o_orderkey) OVER (ORDER BY o_orderkey DESC) AS next_key
           FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey""",
    ),
    (
        "qualify_workaround",  # per-group champion via windowed derived
        # table + outer rn = 1 filter (the portable QUALIFY spelling)
        """SELECT c_mktsegment, c_custkey, c_acctbal FROM (
             SELECT c_mktsegment, c_custkey, c_acctbal,
                    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                       ORDER BY c_acctbal DESC, c_custkey) AS rn
             FROM customer) t
           WHERE rn = 1 ORDER BY c_mktsegment""",
    ),
    (
        "multi_cte_reuse",  # one CTE consumed by a second CTE AND the body
        """WITH big AS (
             SELECT o_custkey, COUNT(*) AS n FROM orders
             GROUP BY o_custkey HAVING COUNT(*) >= 3
           ), tagged AS (SELECT o_custkey, n, n % 2 AS parity FROM big)
           SELECT t.parity, COUNT(*) AS cnt, SUM(b.n) AS total
           FROM tagged t JOIN big b ON t.o_custkey = b.o_custkey
           GROUP BY t.parity ORDER BY t.parity""",
    ),
    (
        "avg_distinct_expr",  # DISTINCT aggregate over a computed key
        """SELECT o_orderstatus, AVG(DISTINCT o_orderkey % 7) AS a, COUNT(*) AS n
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "min_max_strings",  # MIN/MAX under binary string ordering
        """SELECT MIN(n_name) AS lo, MAX(n_name) AS hi FROM nation""",
    ),
    (
        "limit_offset_orders_keyorder",  # LIMIT k OFFSET n pagination
        """SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 5""",
    ),
    (
        "having_grouping_fn",  # groupby_grouping_sets: HAVING filters on the
        # GROUPING() marker to keep only the per-returnflag subtotal level
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
           FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
           HAVING GROUPING(l_linestatus) = 1 AND GROUPING(l_returnflag) = 0
           ORDER BY l_returnflag""",
    ),
    (
        "range_interval_date",  # RANGE frame bounded by a day interval over
        # a DATE ordering column
        """SELECT o_orderkey, o_orderdate,
                  COUNT(*) OVER (ORDER BY o_orderdate
                    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
                    AS n30
           FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""",
    ),
    (
        "coalesce_nullif_chain",  # udf_coalesce.q composed with NULLIF
        """SELECT o_orderkey,
                  COALESCE(NULLIF(o_orderkey % 3, 0), o_custkey, 999) AS c
           FROM orders WHERE o_orderkey <= 30 ORDER BY o_orderkey""",
    ),
]


# Twenty-second tranche: ordered-set aggregates and modern aggregate
# surface. Prototyped and DROPPED as genuinely non-portable:
# percentile_disc WITHIN GROUP (boundary-pick semantics differ),
# listagg/string_agg (Spark wants WITHIN GROUP, DuckDB wants ORDER BY
# inside the argument list — no single text parses on both), and
# mode(... ORDER BY) (Spark rejects the deterministic-tie form).
QSCRIPTS_R21 = [
    (
        "percentile_cont_within_group_intkey",  # ordered-set aggregate: ANSI
        # WITHIN GROUP median, linear interpolation identical on both
        """SELECT o_orderstatus,
                  percentile_cont(0.5) WITHIN GROUP (ORDER BY o_orderkey) AS med
           FROM orders WHERE o_orderkey <= 1000
           GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "mode_aggregate",  # mode(): ties are engine-arbitrary, so the
        # modal value is made dominant BY CONSTRUCTION (quantity <= 40
        # covers ~80% of lineitem at every SF) — regeneration-proof,
        # unlike keying on whichever l_linestatus happens to lead
        """SELECT l_returnflag,
                  mode(CASE WHEN l_quantity <= 40 THEN 'common' ELSE 'rare' END) AS m
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ),
    (
        "bitwise_aggregates",  # bit_and/bit_or/bit_xor — exact integer
        """SELECT o_orderstatus, bit_and(o_orderkey) AS ba,
                  bit_or(o_orderkey) AS bo, bit_xor(o_orderkey) AS bx
           FROM orders WHERE o_orderkey <= 500
           GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "count_if_aggregate",  # count_if shorthand for SUM(CASE...)
        """SELECT o_orderstatus, count_if(o_totalprice > 200000) AS n_big,
                  COUNT(*) AS n
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "floor_ceil_negative",  # rounding toward -inf/+inf on negatives;
        # BIGINT cast normalizes Spark's integral floor vs DuckDB's double
        """SELECT o_orderkey, CAST(floor(-o_totalprice / 1000) AS BIGINT) AS f,
                  CAST(ceil(-o_totalprice / 1000) AS BIGINT) AS c
           FROM orders WHERE o_orderkey <= 30 ORDER BY o_orderkey""",
    ),
    (
        "log2_exact_powers",  # log2 over exact powers of two is IEEE-exact
        """SELECT n_nationkey,
                  log2(CAST(power(2, n_nationkey % 20) AS DOUBLE)) AS lg
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "desc_nulls_last",  # explicit DESC NULLS LAST (non-default on
        # both engines in opposite ways)
        """SELECT o_orderkey,
                  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS st
           FROM orders WHERE o_orderkey <= 150
           ORDER BY st DESC NULLS LAST, o_orderkey""",
    ),
    (
        "intersect_precedence",  # ANSI: INTERSECT binds tighter than UNION
        """SELECT v FROM (
             SELECT n_nationkey AS v FROM nation WHERE n_nationkey < 5
             UNION SELECT n_nationkey FROM nation WHERE n_nationkey BETWEEN 10 AND 20
             INTERSECT SELECT n_nationkey FROM nation WHERE n_nationkey % 2 = 0
           ) t ORDER BY v""",
    ),
    (
        "nested_subquery_3deep",  # IN-subquery chained three levels
        """SELECT c_custkey FROM customer WHERE c_custkey IN (
             SELECT o_custkey FROM orders WHERE o_orderkey IN (
               SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49))
           ORDER BY c_custkey LIMIT 30""",
    ),
]


# Twenty-third tranche: expression join keys, two window specs in one
# SELECT, duplicate GROUPING SETS (ANSI: duplicates emit duplicate
# groups), string-vs-number comparison semantics, old-style comma
# joins, string BETWEEN, share-of-total via a global window over an
# aggregate, correlated COUNT in the SELECT list, self-UNION
# distinctness. (array_contains over a split was prototyped and
# dropped: the split function itself has no shared name — Spark
# `split` vs DuckDB `string_split`.)
QSCRIPTS_R22 = [
    (
        "join_on_expression",  # join key is an expression on both sides
        """SELECT n_name, r_name FROM nation
           JOIN region ON n_regionkey + 1 = r_regionkey + 1 ORDER BY n_name""",
    ),
    (
        "two_window_specs",  # two OVER clauses with different partitioning
        # in one projection (two Window operators, one pass each)
        """SELECT o_orderkey,
                  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                     ORDER BY o_orderkey) AS rn_status,
                  RANK() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk_price
           FROM orders WHERE o_orderkey <= 120 ORDER BY o_orderkey""",
    ),
    (
        "grouping_sets_duplicate",  # ANSI: a duplicated grouping set
        # contributes its groups TWICE
        """SELECT l_returnflag, COUNT(*) AS n
           FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag))
           ORDER BY l_returnflag""",
    ),
    (
        "string_number_compare",  # lexicographic, not numeric: '9' > '15'
        """SELECT n_nationkey FROM nation
           WHERE CAST(n_nationkey AS STRING) > '15' ORDER BY n_nationkey""",
    ),
    (
        "oldstyle_comma_join",  # pre-ANSI comma join + WHERE equi-predicate
        """SELECT n_name, r_name FROM nation, region
           WHERE n_regionkey = r_regionkey AND r_name = 'ASIA' ORDER BY n_name""",
    ),
    (
        "between_strings",  # BETWEEN under string collation
        """SELECT n_nationkey, n_name FROM nation
           WHERE n_name BETWEEN 'NATION_1' AND 'NATION_2' ORDER BY n_nationkey""",
    ),
    (
        "share_of_total_window",  # windowing_gby: empty-OVER total over the
        # aggregate output — the percent-of-total idiom
        """SELECT o_orderstatus, COUNT(*) AS n,
                  CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS share
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "correlated_count_select",  # correlated aggregate subquery projected
        # per outer row (subquery_in_select family)
        """SELECT c_custkey,
                  (SELECT COUNT(*) FROM orders o
                   WHERE o.o_custkey = c.c_custkey) AS n_orders
           FROM customer c WHERE c_custkey <= 40 ORDER BY c_custkey""",
    ),
    (
        "self_union_distinct",  # UNION of a relation with itself = identity
        """SELECT COUNT(*) AS n FROM (
             SELECT n_regionkey FROM nation UNION SELECT n_regionkey FROM nation
           ) t""",
    ),
]


# Twenty-fourth tranche: OR-disjunct join conditions, NOT BETWEEN,
# LIMIT inside an IN-subquery, int-division and negative-modulo
# semantics, EXISTS over a UNION'd correlated subquery, FULL JOIN
# key reconciliation via COALESCE, the LEFT JOIN ... IS NULL manual
# anti-join, NULL-typed first UNION branch, sliding MIN/MAX frames,
# computed substr offsets. (CAST(double AS INT) was prototyped and
# DROPPED: Spark truncates toward zero, DuckDB rounds — a real
# divergence, not a portability bug.)
QSCRIPTS_R23 = [
    (
        "join_condition_or",  # OR disjunct forces a non-equi join path
        """SELECT n_nationkey, r_regionkey FROM nation JOIN region
           ON n_regionkey = r_regionkey OR n_nationkey = r_regionkey + 20
           ORDER BY n_nationkey, r_regionkey""",
    ),
    (
        "not_between",  # negated range predicate
        """SELECT o_orderkey FROM orders
           WHERE o_orderkey <= 200 AND o_totalprice NOT BETWEEN 50000 AND 300000
           ORDER BY o_orderkey""",
    ),
    (
        "in_subquery_with_limit_keys",  # ordered LIMIT inside IN (renamed
        # from a duplicate 'in_subquery_with_limit' id; o_orderkey
        # tiebreak pins the key set across engines — ADVICE r5)
        """SELECT c_custkey FROM customer WHERE c_custkey IN (
             SELECT o_custkey FROM orders
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 20)
           ORDER BY c_custkey""",
    ),
    (
        "int_division_semantics",  # non-ANSI int / int -> double on both
        """SELECT n_nationkey, n_nationkey / 4 AS q, n_nationkey % 4 AS r
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "modulo_negative",  # C-style: remainder takes the dividend's sign
        """SELECT n_nationkey, (0 - n_nationkey) % 7 AS m
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "exists_union_subquery",  # correlated EXISTS whose body is a UNION
        """SELECT n_name FROM nation n WHERE EXISTS (
             SELECT 1 FROM region WHERE r_regionkey = n.n_regionkey
                                    AND r_name = 'ASIA'
             UNION
             SELECT 1 FROM region WHERE r_regionkey = n.n_regionkey
                                    AND r_name = 'EUROPE')
           ORDER BY n_name""",
    ),
    (
        "full_join_coalesce_keys",  # the reconciliation idiom: FULL JOIN
        # two aggregates and COALESCE the key out of whichever side hit
        """SELECT COALESCE(a.k, b.k) AS k, a.n AS n_a, b.n AS n_b FROM
             (SELECT n_regionkey AS k, COUNT(*) AS n FROM nation
              WHERE n_nationkey < 12 GROUP BY 1) a
           FULL JOIN
             (SELECT n_regionkey AS k, COUNT(*) AS n FROM nation
              WHERE n_nationkey >= 12 GROUP BY 1) b
           ON a.k = b.k ORDER BY k""",
    ),
    (
        "left_join_null_filter_anti",  # manual anti-join spelling
        """SELECT n.n_nationkey FROM nation n
           LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
                                AND c.c_acctbal > 9990
           WHERE c.c_custkey IS NULL ORDER BY n.n_nationkey""",
    ),
    (
        "null_first_branch_union",  # untyped NULL in the first branch takes
        # the other branch's type
        """SELECT v FROM (
             SELECT NULL AS v FROM region WHERE r_regionkey = 0
             UNION ALL SELECT n_nationkey FROM nation WHERE n_nationkey < 3
           ) t ORDER BY v NULLS FIRST""",
    ),
    (
        "window_minmax_sliding",  # extreme-value sliding frames
        """SELECT o_orderkey,
                  MIN(o_totalprice) OVER (ORDER BY o_orderkey
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mn,
                  MAX(o_totalprice) OVER (ORDER BY o_orderkey
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mx
           FROM orders WHERE o_orderkey <= 80 ORDER BY o_orderkey""",
    ),
    (
        "substr_computed_start",  # substr offset from an expression
        """SELECT n_nationkey,
                  substr(n_name, CAST(n_nationkey % 5 AS INT) + 1, 4) AS piece
           FROM nation ORDER BY n_nationkey""",
    ),
]


# Twenty-fifth tranche: ORDER BY ALL, aggregates as sort keys,
# windows over DISTINCT subqueries, correlated EXISTS with
# GROUP BY + HAVING, ORDER/LIMIT applied to a whole UNION, pad
# truncation, exact integer powers, WITH inside a derived table,
# NULL join keys never matching, and EXISTS over LIMIT 0.
QSCRIPTS_R24 = [
    (
        "order_by_all",  # ORDER BY ALL pairs with GROUP BY ALL
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
           FROM orders GROUP BY ALL ORDER BY ALL""",
    ),
    (
        "agg_in_order_by",  # sort key is an aggregate not in the SELECT list
        """SELECT o_orderstatus FROM orders
           GROUP BY o_orderstatus ORDER BY COUNT(*) DESC, o_orderstatus""",
    ),
    (
        "window_over_distinct",  # window numbering over a DISTINCT subquery
        """SELECT st, ROW_NUMBER() OVER (ORDER BY st) AS rn FROM (
             SELECT DISTINCT o_orderstatus AS st FROM orders) t ORDER BY rn""",
    ),
    (
        "exists_having_agg",  # correlated EXISTS whose body aggregates and
        # filters on HAVING (subquery_exists_having family)
        """SELECT c_custkey FROM customer c WHERE EXISTS (
             SELECT o_custkey FROM orders o WHERE o.o_custkey = c.c_custkey
             GROUP BY o_custkey HAVING COUNT(*) >= 5)
           ORDER BY c_custkey LIMIT 25""",
    ),
    (
        "union_order_limit_whole",  # trailing ORDER/LIMIT binds to the whole
        # UNION, not the last branch
        """SELECT n_name AS nm FROM nation WHERE n_regionkey = 0
           UNION ALL SELECT r_name FROM region
           ORDER BY nm LIMIT 8""",
    ),
    (
        "lpad_truncation",  # pad to a SHORTER length truncates on both
        """SELECT n_nationkey, lpad(n_name, 4, 'x') AS t4,
                  rpad(n_name, 3, 'y') AS t3
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "power_int_exact",  # small integer powers are IEEE-exact doubles
        """SELECT n_nationkey, power(2, n_nationkey % 10) AS p
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "nested_cte_subquery",  # WITH scoped inside a derived table
        """SELECT t.k, t.n FROM (
             WITH r0 AS (SELECT n_regionkey AS k FROM nation WHERE n_nationkey < 15)
             SELECT k, COUNT(*) AS n FROM r0 GROUP BY k) t ORDER BY t.k""",
    ),
    (
        "null_join_keys_drop",  # equi-join semantics: NULL keys match nothing
        """SELECT COUNT(*) AS n FROM
             (SELECT CASE WHEN n_nationkey % 3 = 0 THEN NULL
                          ELSE n_regionkey END AS k FROM nation) a
           JOIN (SELECT r_regionkey AS k FROM region) b ON a.k = b.k""",
    ),
    (
        "exists_limit_zero",  # EXISTS over LIMIT 0 is definitionally false
        """SELECT n_nationkey FROM nation
           WHERE EXISTS (SELECT 1 FROM region LIMIT 0) OR n_nationkey < 3
           ORDER BY n_nationkey""",
    ),
]


# Twenty-sixth tranche: regexp_replace, month-interval end-of-month
# clamping, GROUP BY on a SELECT alias, forward-unbounded frames
# (DECIMAL-summed — a double tail-sum differs in accumulation order
# between engines), LEADING/TRAILING character-set TRIM, IN lists
# containing NULL, EXISTS inside CASE, and non-ANSI division by
# zero yielding NULL. (octet_length dropped: DuckDB defines it only
# for BLOBs.)
QSCRIPTS_R25 = [
    (
        "regexp_replace_fn",  # udf_regexp_replace.q: same 3-arg signature
        """SELECT n_nationkey, regexp_replace(n_name, '[0-9]+', '#') AS masked
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "interval_month_clamp",  # interval_arithmetic.q: +1 MONTH clamps to
        # month end identically
        """SELECT o_orderkey, o_orderdate,
                  CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_m
           FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey""",
    ),
    (
        "group_by_select_alias",  # groupby expression alias resolution
        """SELECT n_regionkey * 10 AS decade, COUNT(*) AS n
           FROM nation GROUP BY decade ORDER BY decade""",
    ),
    (
        "frame_to_unbounded_following",  # forward-unbounded running frame;
        # DECIMAL accumulation — double window sums accumulate in
        # engine-specific order and diverge in the last bits
        """SELECT o_orderkey,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                    ORDER BY o_orderkey
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                    AS DOUBLE) AS tail_sum
           FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey""",
    ),
    (
        "trim_leading_trailing",  # udf_trim.q: one-sided character-set trim
        """SELECT n_nationkey,
                  TRIM(LEADING 'N' FROM n_name) AS no_lead_n,
                  TRIM(TRAILING '0123456789' FROM n_name) AS no_digits
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "in_with_null_literal",  # IN (.., NULL, ..): matches are TRUE, the
        # NULL element never matches anything
        """SELECT n_nationkey FROM nation
           WHERE n_regionkey IN (1, NULL, 3) ORDER BY n_nationkey""",
    ),
    (
        "exists_in_case",  # correlated EXISTS as a CASE condition
        """SELECT n_nationkey,
                  CASE WHEN EXISTS (SELECT 1 FROM region
                                    WHERE r_regionkey = n_regionkey
                                      AND r_name = 'ASIA')
                       THEN 'asia' ELSE 'other' END AS zone
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "division_by_zero_null",  # non-ANSI: x / 0 is NULL on both engines
        """SELECT n_nationkey, n_nationkey / (n_regionkey - n_regionkey) AS dz
           FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey""",
    ),
]


# Twenty-seventh tranche: if() shorthand, string literals against
# DATE columns, CASE-driven custom sort orders, a ROLLUP pair
# producing the cube lattice, empty-input aggregate identities,
# NOT IN over an empty subquery, boolean→int casts, DISTINCT over
# an expression.
QSCRIPTS_R26 = [
    (
        "if_function",  # udf_if.q: the Hive if() shorthand
        """SELECT n_nationkey, if(n_regionkey = 0, 'zero', 'nonzero') AS z
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "date_vs_string_literal",  # implicit string→date coercion in range
        # predicates (the most common ad-hoc date filter spelling)
        """SELECT COUNT(*) AS n FROM orders
           WHERE o_orderdate >= '1995-06-01' AND o_orderdate < '1995-07-01'""",
    ),
    (
        "order_by_case",  # custom collation via CASE sort key
        """SELECT o_orderpriority, COUNT(*) AS n FROM orders
           GROUP BY o_orderpriority
           ORDER BY CASE o_orderpriority WHEN '1-URGENT' THEN 1
                    WHEN '2-HIGH' THEN 2 ELSE 9 END, o_orderpriority""",
    ),
    (
        "multiple_rollups",  # two independent ROLLUPs compose into the
        # cross-product lattice (groupby_grouping_sets family)
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
           FROM lineitem GROUP BY ROLLUP(l_returnflag), ROLLUP(l_linestatus)
           ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    ),
    (
        "empty_input_aggregates",  # nullgroup.q: COUNT 0, SUM/MAX NULL on
        # empty input — one row, not zero rows
        """SELECT COUNT(*) AS c, SUM(o_totalprice) AS s, MAX(o_orderkey) AS m
           FROM orders WHERE o_orderkey < 0""",
    ),
    (
        "not_in_empty_subquery",  # NOT IN over the empty set is TRUE for
        # every row (the NULL trap only exists for non-empty sets)
        """SELECT n_nationkey FROM nation
           WHERE n_nationkey NOT IN (SELECT o_custkey FROM orders
                                     WHERE o_orderkey < 0)
             AND n_nationkey < 5 ORDER BY n_nationkey""",
    ),
    (
        "cast_bool_int",  # boolean→int cast produces 0/1
        """SELECT n_nationkey, CAST(n_regionkey = 0 AS INT) AS is_zero
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "distinct_on_expression",  # DISTINCT over a computed value
        """SELECT DISTINCT n_nationkey % 5 AS m FROM nation ORDER BY m""",
    ),
]


# Twenty-eighth tranche: shapes ported from SPECIFIC previously
# untouched clientpositive scripts (file named per entry). Two
# numeric spellings were adjusted during porting: DECIMAL→BIGINT
# casts go through floor() (Spark truncates the cast, DuckDB
# rounds), and averages are spelled SUM/COUNT of exact decimals
# (AVG over DECIMAL picks engine-specific result scales whose
# rounding diverges at the scale boundary).
QSCRIPTS_R27 = [
    (
        "multi_distinct_mixed",  # groupby2_noskew_multi_distinct.q: two
        # DISTINCT aggregates + group key concatenated with a sum
        """SELECT substr(o_orderpriority, 1, 1) AS k,
                  COUNT(DISTINCT o_custkey) AS c1,
                  concat(substr(o_orderpriority, 1, 1),
                         CAST(CAST(floor(SUM(CAST(o_totalprice AS DECIMAL(18,2))))
                              AS BIGINT) AS STRING)) AS c2,
                  CAST(SUM(DISTINCT o_custkey) AS BIGINT) AS c3,
                  COUNT(o_orderstatus) AS c4
           FROM orders GROUP BY substr(o_orderpriority, 1, 1) ORDER BY k""",
    ),
    (
        "aggregate_battery",  # groupby3_map.q: the full aggregate battery
        # incl. AVG DISTINCT, in one global pass
        """SELECT
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a,
             CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS ad,
             MAX(l_quantity) AS mx, MIN(l_quantity) AS mn
           FROM lineitem WHERE l_orderkey <= 500""",
    ),
    (
        "udf_bin",  # udf_bin.q: binary-string rendering of integers
        """SELECT n_nationkey, bin(n_nationkey) AS b, bin(99992421) AS big
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "const_where_groupby",  # notable_alias1.q: constant projection +
        # WHERE + GROUP BY with count(1)
        """SELECT '1234' AS dummy, o_custkey, COUNT(1) AS n
           FROM orders WHERE o_orderkey < 500 GROUP BY o_custkey
           ORDER BY o_custkey LIMIT 30""",
    ),
    (
        "five_table_join_chain",  # mergejoins.q: four same-key joins + one
        # on a second key — the merge-join chain planner case
        """SELECT COUNT(*) AS n FROM nation a
           JOIN nation b ON a.n_nationkey = b.n_nationkey
           JOIN nation c ON a.n_nationkey = c.n_nationkey
           JOIN nation d ON a.n_nationkey = d.n_nationkey
           JOIN region e ON a.n_regionkey = e.r_regionkey""",
    ),
    (
        "outer_join_on_extra_filter",  # mergejoins.q second shape: inner
        # then LEFT OUTER whose ON carries an extra build-side filter
        """SELECT a.n_nationkey, c.n_nationkey AS ck
           FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey
           LEFT OUTER JOIN nation c ON b.n_nationkey = c.n_nationkey
                                    AND b.n_nationkey < 10
           ORDER BY a.n_nationkey""",
    ),
    (
        "union_of_counts",  # input41.q: union of two scalar counts,
        # ordered and limited as a derived table
        """SELECT cnt FROM (
             SELECT COUNT(1) AS cnt FROM orders
             UNION ALL SELECT COUNT(1) AS cnt FROM customer) x
           ORDER BY cnt LIMIT 2""",
    ),
    (
        "multi_distinct_battery",  # groupby_sort_11.q: count(distinct),
        # count(1), count(col), sum(distinct) together
        """SELECT COUNT(DISTINCT o_custkey) AS cd, COUNT(1) AS c1,
                  COUNT(o_custkey) AS ck, CAST(SUM(DISTINCT o_custkey) AS BIGINT) AS sd
           FROM orders""",
    ),
    (
        "null_projection_typed",  # null_column.q: typed NULL projections
        """SELECT CAST(NULL AS INT) AS a, CAST(NULL AS STRING) AS b, n_nationkey
           FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey""",
    ),
]


# Twenty-ninth tranche: five more grounded ports (source script per
# entry). input26's second branch was adapted to an ORDERED limit —
# the original's bare `LIMIT 5` picks engine-arbitrary rows; and
# ppd_join4's contradictory predicates were made satisfiable (the
# harness rejects empty results as vacuous).
QSCRIPTS_R28 = [
    (
        "derived_join_constant_filter",  # join38.q: join keyed on a derived
        # column with a constant filter on the build side + group
        """SELECT a.o_orderstatus, b.derived5, COUNT(1) AS cnt
           FROM orders a JOIN (
             SELECT o_orderkey, CAST(o_orderkey + 5 AS INT) AS derived5,
                    CAST(o_orderkey + 11 AS INT) AS col11
             FROM orders WHERE o_orderkey <= 300) b
           ON a.o_orderkey = b.col11
           WHERE b.col11 <= 200
           GROUP BY a.o_orderstatus, b.derived5
           ORDER BY a.o_orderstatus, b.derived5 LIMIT 40""",
    ),
    (
        "incremental_union_refresh",  # union22.q: base slice UNION ALL a
        # LEFT OUTER JOIN against the filtered delta — the incremental
        # partition-refresh shape
        """SELECT k1, k3 FROM (
             SELECT n_nationkey AS k1, n_regionkey AS k3
             FROM nation WHERE n_nationkey <= 12
             UNION ALL
             SELECT a.n_nationkey AS k1, b.n_regionkey AS k3
             FROM nation a LEFT OUTER JOIN
               (SELECT * FROM nation WHERE n_nationkey > 12) b
               ON a.n_nationkey = b.n_nationkey
             WHERE a.n_nationkey > 12
           ) t ORDER BY k1, k3 NULLS FIRST""",
    ),
    (
        "pushdown_through_sorted_subquery",  # ppd_join4.q: outer predicates
        # push through a doubly-nested sorted derived table into the join
        """SELECT t2.n_nationkey, t2.n_name FROM (
             SELECT n_nationkey, n_name FROM (
               SELECT n_nationkey, n_name FROM nation) t1 ORDER BY n_nationkey) t2
           JOIN nation t3 ON t2.n_nationkey = t3.n_nationkey
           WHERE t2.n_name LIKE 'NATION_1%' AND t3.n_regionkey = 1
           ORDER BY t2.n_nationkey""",
    ),
    (
        "union_of_limited_subqueries",  # input26.q: UNION ALL of two
        # ordered-LIMIT derived tables, re-sorted outside
        """SELECT * FROM (
             SELECT * FROM (SELECT o_orderkey, o_orderstatus FROM orders
                            WHERE o_orderstatus = 'F'
                            ORDER BY o_orderkey LIMIT 5) pa
             UNION ALL
             SELECT * FROM (SELECT o_orderkey, o_orderstatus FROM orders
                            WHERE o_orderstatus = 'O'
                            ORDER BY o_orderkey LIMIT 5) pb
           ) subq ORDER BY o_orderkey""",
    ),
    (
        "union_tree_join",  # cbo_union.q: a join whose BOTH inputs are
        # union trees, with a post-join filter
        """SELECT r2.k FROM
             (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 10
              UNION ALL SELECT r_regionkey FROM region) r2
           JOIN
             (SELECT n_nationkey AS k FROM nation WHERE n_nationkey >= 0
              UNION ALL SELECT r_regionkey FROM region) r3
           ON r2.k = r3.k WHERE r3.k >= 0 ORDER BY r2.k""",
    ),
]


# Thirtieth tranche: four final grounded ports.
# (quotedid_basic.q was examined and skipped: Spark quotes exotic
# identifiers with backticks, DuckDB with double quotes — no single
# text parses on both.)
QSCRIPTS_R29 = [
    (
        "overlapping_outer_self_joins",  # join_filters_overlap.q: two LEFT
        # OUTER self-joins whose ON clauses carry constant predicates on
        # BOTH sides — the preserved-row semantics planners get wrong
        """SELECT a.n_nationkey, b.n_nationkey AS bk, c.n_nationkey AS ck
           FROM nation a
           LEFT OUTER JOIN nation b ON a.n_nationkey = b.n_nationkey
                                    AND a.n_regionkey = 1 AND b.n_regionkey = 1
           LEFT OUTER JOIN nation c ON a.n_nationkey = c.n_nationkey
                                    AND a.n_regionkey = 2 AND c.n_regionkey = 2
           ORDER BY a.n_nationkey""",
    ),
    (
        "right_then_left_outer_chain",  # join_filters_overlap.q: RIGHT then
        # LEFT outer, the second keyed on the preserved middle table
        """SELECT a.n_nationkey AS ak, b.n_nationkey AS bk, c.n_nationkey AS ck
           FROM nation a
           RIGHT OUTER JOIN nation b ON a.n_nationkey = b.n_nationkey
                                     AND a.n_regionkey = 1 AND b.n_regionkey = 1
           LEFT OUTER JOIN nation c ON b.n_nationkey = c.n_nationkey
                                    AND b.n_regionkey = 2 AND c.n_regionkey = 2
           ORDER BY bk""",
    ),
    (
        "distinct_same_group_key",  # groupby_distinct_samekey.q: DISTINCT
        # aggregate over the grouping key itself (trivially the key)
        """SELECT q1.k, SUM(DISTINCT q1.k) AS s FROM (
             SELECT n_regionkey AS k FROM nation ORDER BY n_regionkey) q1
           GROUP BY q1.k ORDER BY q1.k""",
    ),
    (
        "union_filter_pushdown",  # union_ppr.q: the outer WHERE pushes into
        # both union branches above partitioned scans
        """SELECT * FROM (
             SELECT x.o_orderkey, x.o_orderstatus FROM orders x
             WHERE x.o_orderkey < 100
             UNION ALL
             SELECT y.o_orderkey, y.o_orderstatus FROM orders y
             WHERE y.o_orderkey < 100
           ) a WHERE a.o_orderstatus = 'F'
           ORDER BY a.o_orderkey, a.o_orderstatus""",
    ),
]


# Thirty-first tranche: four last grounded ports. (no_hooks.q's bare
# `JOIN ... WHERE` with no ON clause was skipped: DuckDB's grammar
# requires ON or an explicit CROSS JOIN; the comma-join spelling is
# already in the twenty-third tranche. ambiguous_col.q's duplicate
# output names were skipped: DuckDB auto-renames them.)
QSCRIPTS_R30 = [
    (
        "chained_key_join_four",  # join_reorder2.q: each join keyed on the
        # PREVIOUS table in the chain (a=b, b=c, c=d)
        """SELECT COUNT(*) AS n, SUM(a.n_nationkey) AS s
           FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey
                         JOIN region c ON b.n_regionkey = c.r_regionkey
                         JOIN region d ON c.r_regionkey = d.r_regionkey""",
    ),
    (
        "agg_over_agg_mixed_or",  # ppd_gby2.q: aggregate over an aggregate
        # with a mixed AND/OR predicate between the layers
        """SELECT MAX(src1.c1) AS m, src1.c2 FROM
             (SELECT o_orderstatus AS c1, COUNT(o_orderkey) AS c2 FROM orders
              WHERE o_orderkey > 10 GROUP BY o_orderstatus) src1
           WHERE src1.c1 > 'A' AND (src1.c2 > 30 OR src1.c1 < 'Z')
           GROUP BY src1.c2 ORDER BY src1.c2""",
    ),
    (
        "case_on_join_ordered",  # udf_case_column_pruning.q: simple-form
        # CASE over join output, ordered by the CASE alias
        """SELECT CASE a.n_regionkey WHEN 1 THEN 2 WHEN 3 THEN 4 ELSE 5 END AS key
           FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey
           ORDER BY key LIMIT 10""",
    ),
    (
        "outer_where_on_limited_subquery",  # order2.q: WHERE applied AFTER
        # an ordered LIMIT — filters the 10-row prefix, not the table
        """SELECT subq.o_orderkey, subq.o_orderstatus FROM
             (SELECT x.o_orderkey, x.o_orderstatus FROM orders x
              ORDER BY o_orderkey LIMIT 10) subq
           WHERE subq.o_orderkey < 8""",
    ),
]


# Thirty-second tranche: union24's four-branch UNION ALL,
# udf_isnull_isnotnull's literal and column null tests, and the
# ANSI IS DISTINCT FROM null-safe inequality (the SQL spelling of
# the <=> negation the DML paths use internally).
# (groupby_complex_types.q was examined and skipped: ARRAY/MAP/
# STRUCT grouping keys produce non-atomic output cells the two
# engines render differently.)
QSCRIPTS_R31 = [
    (
        "four_branch_union",  # union24.q: four filtered branches
        """SELECT s.k, s.n FROM (
             SELECT n_nationkey AS k, 1 AS n FROM nation WHERE n_nationkey < 10
             UNION ALL SELECT n_nationkey, 2 FROM nation WHERE n_nationkey < 10
             UNION ALL SELECT r_regionkey, 3 FROM region WHERE r_regionkey < 10
             UNION ALL SELECT r_regionkey, 4 FROM region WHERE r_regionkey < 10
           ) s ORDER BY s.k, s.n""",
    ),
    (
        "isnull_isnotnull_literals",  # udf_isnull_isnotnull.q
        """SELECT NULL IS NULL AS a, 1 IS NOT NULL AS b,
                  'x' IS NOT NULL AS c,
                  CASE WHEN n_nationkey % 4 = 0 THEN NULL
                       ELSE n_nationkey END IS NULL AS d
           FROM nation ORDER BY n_nationkey LIMIT 12""",
    ),
    (
        "is_distinct_from",  # ANSI null-safe inequality
        """SELECT n_nationkey,
                  CASE WHEN n_nationkey % 3 = 0 THEN NULL
                       ELSE n_regionkey END IS DISTINCT FROM n_regionkey AS dd
           FROM nation ORDER BY n_nationkey""",
    ),
]


# Thirty-third tranche: four final grounded ports.
QSCRIPTS_R32 = [
    (
        "inner_then_right_outer_filters",  # join40.q: inner join with a
        # probe-side ON filter feeding a RIGHT OUTER with its own
        """SELECT s1.n_nationkey AS k1, s2.n_nationkey AS k2, s3.n_nationkey AS k3
           FROM nation s1 JOIN nation s2 ON s1.n_nationkey = s2.n_nationkey
                                         AND s1.n_nationkey < 10
           RIGHT OUTER JOIN nation s3 ON s1.n_nationkey = s3.n_nationkey
                                      AND s3.n_nationkey < 20
           ORDER BY k3, k1""",
    ),
    (
        "least_greatest_strings",  # udf_least.q / udf_greatest.q: string
        # arguments under binary collation, incl. case-mixed sets
        """SELECT LEAST('a', 'b', 'c') AS l1, LEAST('C', 'a', 'B') AS l2,
                  GREATEST('AAA', 'AaA', 'AAa') AS g1,
                  GREATEST('A', 'AA', 'AAA') AS g2,
                  n_nationkey
           FROM nation WHERE n_nationkey < 3 ORDER BY n_nationkey""",
    ),
    (
        "union_of_same_aggregate",  # union_remove_25.q: identical aggregate
        # branches (the union-remove optimizer's no-go case — results
        # must stay duplicated)
        """SELECT a.k, a.vals FROM (
             SELECT o_orderstatus AS k, COUNT(1) AS vals FROM orders
             GROUP BY o_orderstatus
             UNION ALL
             SELECT o_orderstatus AS k, COUNT(1) AS vals FROM orders
             GROUP BY o_orderstatus
           ) a ORDER BY a.k, a.vals""",
    ),
    (
        "join_in_scalar_derived",  # cross_product_check_1.q: grouped
        # self-join inside a derived table with a vacuous 1=1 conjunct
        """SELECT od1.k FROM (
             SELECT d1.n_nationkey AS k FROM nation d1
             JOIN nation d2 ON d1.n_nationkey = d2.n_nationkey
             WHERE 1 = 1 GROUP BY d1.n_nationkey) od1
           WHERE od1.k < 12 ORDER BY od1.k""",
    ),
]


# Thirty-fourth tranche: three final grounded ports.
QSCRIPTS_R33 = [
    (
        "abs_extremes",  # udf_abs.q: abs over BIGINT extremes
        """SELECT abs(0) AS a0, abs(-1) AS a1, abs(123) AS a2,
                  abs(CAST(-9223372036854775807 AS BIGINT)) AS amin,
                  abs(n_nationkey - 12) AS arel
           FROM nation ORDER BY n_nationkey LIMIT 25""",
    ),
    (
        "union_scalar_with_rows",  # union17.q: scalar-aggregate branch
        # unioned with a row stream, types reconciled to STRING
        """SELECT u.key, u.value FROM (
             SELECT 'tst1' AS key, CAST(COUNT(1) AS STRING) AS value FROM orders
             UNION ALL
             SELECT o_orderstatus AS key, CAST(o_orderkey AS STRING) AS value
             FROM orders WHERE o_orderkey <= 30
           ) u ORDER BY u.key, u.value""",
    ),
    (
        "nested_table_aliases",  # subquery_alias.q: triple-nested aliased
        # SELECT * derived tables resolve through every layer
        """SELECT src2.n_nationkey, src2.n_name FROM
             ( SELECT * FROM ( SELECT * FROM nation AS s ) AS src1 ) AS src2
           WHERE src2.n_nationkey < 7 ORDER BY src2.n_nationkey""",
    ),
]


# Thirty-fifth tranche: two final grounded ports.
QSCRIPTS_R34 = [
    (
        "join_union_constant_on",  # union27.q: join against a union-typed
        # derived table with a constant key equality inside the ON
        """SELECT b.k, b.src FROM nation a JOIN (
             SELECT n_nationkey AS k, 'dim' AS src FROM nation
             UNION ALL SELECT r_regionkey AS k, 'add' AS src FROM region
           ) b ON a.n_nationkey = b.k AND b.k = 3
           ORDER BY b.src""",
    ),
    (
        "ordered_limit_self_join",  # order_within_subquery.q: ordered-LIMIT
        # prefix joined back to the base table on two columns
        """SELECT t1.p_name, t2.p_name AS p2
           FROM (SELECT * FROM part ORDER BY p_size, p_partkey LIMIT 10) t1
           JOIN part t2 ON t1.p_partkey = t2.p_partkey AND t1.p_size = t2.p_size
           WHERE t1.p_partkey < 100000
           ORDER BY t1.p_name, p2""",
    ),
]


# Thirty-sixth tranche: three grounded ports. join_nullsafe.q's <=>
# operator is Hive/Spark-only — the ANSI IS NOT DISTINCT FROM
# spelling is the text both engines parse.
QSCRIPTS_R35 = [
    (
        "nullsafe_join",  # join_nullsafe.q: NULL keys MATCH each other
        # under the null-safe equality join
        """SELECT a.k AS ka, b.k AS kb FROM
             (SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
                          ELSE n_regionkey END AS k,
                     n_nationkey AS id FROM nation) a
           JOIN
             (SELECT CASE WHEN r_regionkey = 2 THEN NULL
                          ELSE r_regionkey END AS k,
                     r_regionkey AS id FROM region) b
           ON a.k IS NOT DISTINCT FROM b.k
           ORDER BY a.id, b.id""",
    ),
    (
        "arith_join_key",  # decimal_join.q: one join side offset by a
        # constant inside the equality
        """SELECT a.o_orderkey, b.o_orderkey AS shifted
           FROM orders a JOIN orders b ON a.o_orderkey = b.o_orderkey + 450
           WHERE a.o_orderkey <= 600 ORDER BY a.o_orderkey""",
    ),
    (
        "groupby_const_cast",  # groupby_neg_float.q: grouping on a constant
        # cast collapses to one group
        """SELECT CAST('-30.33' AS DOUBLE) AS c, COUNT(*) AS n
           FROM orders GROUP BY CAST('-30.33' AS DOUBLE)""",
    ),
]


# Thirty-seventh tranche: range-band joins via BETWEEN in ON,
# compound AND/OR CASE conditions, deep function nesting, combined
# range+IN predicates, HAVING BETWEEN over aggregates, and an OR
# predicate spanning both sides of a comma join.
QSCRIPTS_R36 = [
    (
        "between_join_range",  # range-band join: BETWEEN inside the ON
        """SELECT a.o_orderkey, b.r_regionkey FROM orders a JOIN region b
           ON a.o_orderkey BETWEEN b.r_regionkey * 100
                               AND b.r_regionkey * 100 + 10
           WHERE a.o_orderkey <= 500 ORDER BY a.o_orderkey, b.r_regionkey""",
    ),
    (
        "case_with_and_or",  # compound boolean conditions inside CASE
        """SELECT o_orderkey,
                  CASE WHEN o_totalprice > 100000 AND o_orderstatus = 'F'
                         THEN 'bigF'
                       WHEN o_totalprice > 100000 OR o_orderkey % 2 = 0
                         THEN 'other'
                       ELSE 'small' END AS cls
           FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey""",
    ),
    (
        "nested_functions_deep",  # four-deep scalar function nesting
        """SELECT n_nationkey,
                  upper(substr(concat(lower(n_name), '-',
                                      CAST(n_regionkey AS STRING)), 3, 8)) AS mangled
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "where_between_dates_and_in",  # combined range + IN predicate
        """SELECT COUNT(*) AS n FROM orders
           WHERE o_orderdate BETWEEN DATE '1994-01-01' AND DATE '1996-12-31'
             AND o_orderpriority IN ('1-URGENT', '2-HIGH')""",
    ),
    (
        "having_between",  # BETWEEN over an aggregate in HAVING
        """SELECT o_custkey, COUNT(*) AS n FROM orders
           GROUP BY o_custkey HAVING COUNT(*) BETWEEN 4 AND 6
           ORDER BY o_custkey LIMIT 30""",
    ),
    (
        "or_predicate_across_tables",  # OR spanning both comma-join sides
        # (blocks pushdown to either side alone)
        """SELECT n.n_nationkey FROM nation n, region r
           WHERE n.n_regionkey = r.r_regionkey
             AND (n.n_nationkey < 3 OR r.r_regionkey > 3)
           ORDER BY n.n_nationkey""",
    ),
]

# --- round 6, tranche 37: long-tail sweep of the remaining portable
# join*/union*/input*/udf* clientpositive families (verdict task 6).
# Every shape was prototyped against BOTH engines before landing.
# Portability drops found while prototyping (documented, not ported):
#   - cluster.q / CLUSTER BY selects: DuckDB has no CLUSTER BY grammar;
#   - semijoin.q as SQL text: Spark spells LEFT SEMI JOIN, DuckDB SEMI
#     JOIN — no shared spelling (the operator itself is covered by
#     join_left_semi in the registry and by the ANTI JOIN shape below,
#     which both engines parse identically);
#   - udf pmod: no DuckDB equivalent (mod % ported instead);
#   - split()[i]: Spark indexes arrays 0-based, DuckDB list_extract is
#     1-based — same text can never agree (substr shapes instead);
#   - quote1.q: backquoted identifiers are Spark-only grammar.
QSCRIPTS_R37 = [
    (
        "join38_postjoin_filter",  # join38.q: join + filter ON the join
        # key applied post-join + group by
        """SELECT r_name, n_regionkey, COUNT(1) AS cnt
           FROM region JOIN nation ON r_regionkey = n_regionkey
           WHERE n_regionkey = 2 GROUP BY r_name, n_regionkey""",
    ),
    (
        "join40_left_vs_filtered_subq",  # join40.q: LEFT OUTER against a
        # filtered subquery (filter must stay on the right side)
        """SELECT n.n_name, f.s_name
           FROM nation n LEFT OUTER JOIN
             (SELECT * FROM supplier WHERE s_suppkey <= 10) f
             ON n.n_nationkey = f.s_nationkey
           ORDER BY n_name, s_name""",
    ),
    (
        "join41_on_condition_right_only",  # join41.q: non-key ON condition
        # of a LEFT OUTER filters only the right side, preserving all left rows
        """SELECT a.n_nationkey, b.n_nationkey AS bk
           FROM nation a LEFT OUTER JOIN nation b
             ON a.n_nationkey = b.n_nationkey AND b.n_nationkey > 10
           ORDER BY a.n_nationkey""",
    ),
    (
        "join40_chain_inner_then_right",  # join40.q: inner-join chain into
        # RIGHT OUTER with per-side ON filters
        """SELECT a.n_nationkey, b.r_regionkey, c.r_regionkey AS ck
           FROM nation a JOIN region b
             ON a.n_regionkey = b.r_regionkey AND a.n_nationkey < 10
           RIGHT OUTER JOIN region c
             ON a.n_regionkey = c.r_regionkey AND c.r_regionkey < 3
           ORDER BY ck, n_nationkey, b.r_regionkey""",
    ),
    (
        "union24_four_branch_mixed",  # union24.q: 4-way UNION ALL mixing
        # pre-aggregated and grouped branches
        """SELECT s.k, s.c FROM (
             SELECT n_regionkey AS k, COUNT(1) AS c FROM nation
             WHERE n_regionkey < 3 GROUP BY n_regionkey
             UNION ALL SELECT r_regionkey AS k, 7 AS c FROM region WHERE r_regionkey < 3
             UNION ALL SELECT r_regionkey AS k, 9 AS c FROM region WHERE r_regionkey < 3
             UNION ALL SELECT n_nationkey AS k, COUNT(1) AS c FROM nation
             WHERE n_nationkey < 3 GROUP BY n_nationkey
           ) s ORDER BY k, c""",
    ),
    (
        "union27_join_union_keyfilter",  # union27.q: join against a union
        # subquery with the key filter inside the ON
        """SELECT b.r_regionkey, b.r_name FROM nation a JOIN
             (SELECT * FROM region UNION ALL SELECT * FROM region) b
             ON a.n_regionkey = b.r_regionkey AND b.r_regionkey = 2
           ORDER BY r_regionkey, r_name""",
    ),
    (
        "union33_maponly_vs_agg",  # union33.q: map-only branch UNION ALL
        # an aggregation branch
        """SELECT k, v FROM (
             SELECT n_name AS k, CAST(n_regionkey AS STRING) AS v FROM nation
             WHERE n_nationkey = 0
             UNION ALL
             SELECT n_name AS k, CAST(COUNT(*) AS STRING) AS v FROM nation GROUP BY n_name
           ) a ORDER BY k, v""",
    ),
    (
        "input26_union_of_ordered_limits",  # input26.q: union of
        # ordered-LIMIT subqueries
        """SELECT * FROM (
             SELECT * FROM (SELECT o_orderkey, o_totalprice FROM orders
                            WHERE o_orderstatus = 'F' ORDER BY o_orderkey LIMIT 5) pa
             UNION ALL
             SELECT * FROM (SELECT o_orderkey, o_totalprice FROM orders
                            WHERE o_orderstatus = 'O' ORDER BY o_orderkey LIMIT 5) pb
           ) subq ORDER BY o_orderkey""",
    ),
    (
        "alias_casted_column",  # alias_casted_column.q (HIVE-2477)
        """SELECT key2 FROM
             (SELECT CAST(n_nationkey AS INT) AS key2 FROM nation) t ORDER BY key2""",
    ),
    (
        "ambiguous_col_positive",  # ambiguous_col.q: qualified reference
        # disambiguates a join of same-schema tables
        """SELECT t.k FROM (SELECT a.n_nationkey AS k
             FROM nation a JOIN region b ON a.n_regionkey = b.r_regionkey) t
           ORDER BY k""",
    ),
    (
        "bool_literal",  # bool_literal.q
        "SELECT TRUE AS t, FALSE AS f, NOT TRUE AS nt",
    ),
    (
        "cast1_matrix",  # cast1.q: numeric cast/promotion matrix
        """SELECT CAST(3 AS SMALLINT) + 2 AS a, 3.0 + 2 AS b,
             3 + CAST(2.0 AS INT) AS c, CAST(1 AS BOOLEAN) AS d,
             CAST('7' AS BIGINT) + 1 AS e""",
    ),
    (
        "ansi_sql_arithmetic",  # ansi_sql_arithmetic.q: int/int division
        # yields a fractional result on both engines (non-ANSI mode)
        "SELECT CAST(o_orderkey AS INT) / 2 AS q FROM orders WHERE o_orderkey <= 6 ORDER BY q",
    ),
    (
        "nullgroup_count_empty_aliased",  # nullgroup.q: global count over an
        # empty input is one row of 0
        "SELECT COUNT(1) AS c FROM nation x WHERE x.n_nationkey > 9999",
    ),
    (
        "nullgroup_sum_empty_strmax",  # nullgroup4.q: sum/max over empty input
        # is one row of NULLs
        "SELECT SUM(n_nationkey) AS s, MAX(n_name) AS m FROM nation WHERE n_nationkey > 9999",
    ),
    (
        "ppd_gby_having_or",  # ppd_gby.q: filter over a grouped subquery
        # with an OR mixing group key and aggregate
        """SELECT src1.c1 FROM
             (SELECT n_name AS c1, COUNT(n_nationkey) AS c2 FROM nation
              WHERE n_name > 'C' GROUP BY n_name) src1
           WHERE src1.c1 > 'E' AND (src1.c2 > 0 OR src1.c1 < 'R') ORDER BY c1""",
    ),
    (
        "subq2_agg_filter",  # subq2.q: range filter above a grouped subquery
        """SELECT a.k, a.c FROM
             (SELECT o_custkey AS k, COUNT(1) AS c FROM orders GROUP BY o_custkey) a
           WHERE a.k >= 1480 ORDER BY k""",
    ),
    (
        "join_filters_inner_allconds",  # join_filters.q: inner join with
        # per-side range conditions in the ON
        """SELECT a.n_nationkey, b.n_nationkey AS bk FROM nation a JOIN nation b
             ON a.n_nationkey = b.n_regionkey AND a.n_nationkey > 2 AND b.n_nationkey > 10
           ORDER BY a.n_nationkey, bk""",
    ),
    (
        "join_filters_full_outer",  # join_filters.q: FULL OUTER with
        # one-sided ON conditions null-extends BOTH ways
        """SELECT a.r_regionkey, b.r_regionkey AS bk FROM region a FULL OUTER JOIN region b
             ON a.r_regionkey = b.r_regionkey AND a.r_regionkey > 1 AND b.r_regionkey < 4
           ORDER BY a.r_regionkey NULLS LAST, bk NULLS LAST""",
    ),
    (
        "join_nulls_cross",  # join_nulls.q: unconditioned join = cross product
        "SELECT COUNT(1) AS c FROM region a CROSS JOIN region b",
    ),
    (
        "anti_join_keeps_unmatched",  # semijoin4.q theme via the one
        # anti-join spelling both engines parse
        """SELECT r_name FROM region ANTI JOIN nation
             ON r_regionkey = n_regionkey AND n_nationkey < 3 ORDER BY r_name""",
    ),
    (
        "limit_pushdown_subquery",  # limit_pushdown.q: ordered LIMIT
        # inside, filter outside
        """SELECT * FROM
             (SELECT c_custkey, c_acctbal FROM customer
              ORDER BY c_acctbal DESC, c_custkey LIMIT 8) t
           WHERE c_acctbal > 0 ORDER BY c_custkey""",
    ),
    (
        "notable_alias_const_gby",  # notable_alias1.q: constant + group key
        """SELECT '1234' AS dummy, n_regionkey, COUNT(1) AS c
             FROM nation WHERE n_nationkey < 20 GROUP BY n_regionkey ORDER BY n_regionkey""",
    ),
    (
        "groupby_distinct_samekey_selfkey",  # groupby_distinct_samekey.q
        """SELECT n_regionkey, COUNT(DISTINCT n_regionkey) AS d
             FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    ),
    (
        "implicit_string_number_cmp",  # implicit cast family (§7.3):
        # int = string literal compares numerically on both
        "SELECT n_nationkey FROM nation WHERE n_nationkey = '7'",
    ),
    (
        "udf_greatest_least_nation_arith",  # udf_greatest.q / udf_least.q
        """SELECT GREATEST(n_nationkey, n_regionkey * 6) AS g,
             LEAST(n_nationkey, n_regionkey * 6) AS l FROM nation
           ORDER BY n_nationkey LIMIT 10""",
    ),
    (
        "udf_case_nested_groupby_ordinal",  # udf_case.q: nested CASE + GROUP BY ordinal
        """SELECT CASE WHEN n_regionkey = 0 THEN
             CASE WHEN n_nationkey > 10 THEN 'hi0' ELSE 'lo0' END
             ELSE 'other' END AS c, COUNT(1) AS n FROM nation GROUP BY 1 ORDER BY c""",
    ),
    (
        "udf_coalesce_nullif_orderby_alias",  # udf_coalesce.q: NULLIF branch exercised
        # on a value that exists in the fixture
        """SELECT COALESCE(NULLIF(n_name, 'NATION_0'), 'masked') AS v
             FROM nation ORDER BY v LIMIT 6""",
    ),
    (
        "input14_transform_like_proj",  # input14.q minus the TRANSFORM
        # subprocess: derived-alias projection + filter above
        """SELECT tkey, tval FROM
             (SELECT n_nationkey AS tkey, n_name AS tval FROM nation) tmap
           WHERE tkey < 10 ORDER BY tkey""",
    ),
    (
        "join_reorder_three_way",  # join_reorder2.q
        """SELECT c.c_custkey, o.o_orderkey, n.n_name
             FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
             JOIN nation n ON c.c_nationkey = n.n_nationkey
           WHERE o.o_totalprice > 400000 ORDER BY o_orderkey""",
    ),
    (
        "groupby_ppr_partial",  # groupby_ppr.q: group by an expression
        """SELECT substr(o_orderpriority, 1, 1) AS p, COUNT(1) AS c
             FROM orders WHERE o_orderkey < 500
           GROUP BY substr(o_orderpriority, 1, 1) ORDER BY p""",
    ),
    (
        "having_on_alias_agg",  # having.q: HAVING on the aggregate
        """SELECT o_orderstatus, AVG(o_totalprice) AS avg_p FROM orders
             GROUP BY o_orderstatus HAVING AVG(o_totalprice) > 100000
           ORDER BY o_orderstatus""",
    ),
    (
        "order_by_expr_not_selected",  # order2.q: ORDER BY an expression
        # absent from the select list
        "SELECT n_name FROM nation ORDER BY length(n_name), n_name LIMIT 10",
    ),
    (
        "count_distinct_plus_sum",  # groupby2.q family: distinct + plain
        # aggregate in one grouping
        """SELECT n_regionkey, COUNT(DISTINCT n_name) AS d, SUM(n_nationkey) AS s
             FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    ),
    (
        "between_string_range",  # udf_between.q: lexicographic BETWEEN
        """SELECT n_name FROM nation
             WHERE n_name BETWEEN 'NATION_1' AND 'NATION_2' ORDER BY n_name""",
    ),
    (
        "in_list_mixed",  # udf_in.q
        "SELECT n_nationkey FROM nation WHERE n_nationkey IN (1, 3, 5, 24) ORDER BY n_nationkey",
    ),
    (
        "udf_string_matrix",  # udf_upper/lower/length/reverse/trim/replace
        """SELECT upper(n_name) AS u, lower(n_name) AS l,
             length(n_name) AS len, reverse(n_name) AS rev, trim('  x  ') AS t,
             replace(n_name, 'NATION', 'N') AS rep FROM nation ORDER BY n_name LIMIT 5""",
    ),
    (
        "udf_math_matrix",  # udf_abs/ceil/floor/round (+ % for pmod,
        # which DuckDB lacks — documented drop)
        """SELECT abs(0 - n_nationkey) AS a, ceil(n_nationkey / 7.0) AS c,
             floor(n_nationkey / 7.0) AS f, round(n_nationkey / 7.0, 2) AS r,
             n_nationkey % 7 AS m FROM nation ORDER BY n_nationkey LIMIT 10""",
    ),
    (
        "groupby_multi_single_reducer",  # groupby_multi_single_reducer.q
        """SELECT o_orderstatus, o_orderpriority, COUNT(1) AS c,
             CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS mn
           FROM orders GROUP BY o_orderstatus, o_orderpriority
           ORDER BY o_orderstatus, o_orderpriority""",
    ),
    (
        "order_within_subquery_agg",  # orderby_limit inside a derived table
        """SELECT k, c FROM
             (SELECT o_orderstatus AS k, COUNT(1) AS c FROM orders
              GROUP BY o_orderstatus ORDER BY c DESC LIMIT 2) t ORDER BY k""",
    ),
    (
        "join_star_schema_filters",  # join_star.q
        """SELECT r.r_name, COUNT(1) AS suppliers
             FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
             JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE s.s_acctbal > 0 GROUP BY r.r_name ORDER BY r_name""",
    ),
    (
        "case_with_agg_filter",  # udf_case.q + conditional aggregation
        """SELECT SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS f,
             SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS o FROM orders""",
    ),
    (
        "cross_join_filtered_as_inner",  # input12.q comma-join rewritten
        # by the planner into an equi-join
        """SELECT a.r_regionkey, b.n_nationkey FROM region a, nation b
             WHERE a.r_regionkey = b.n_regionkey AND b.n_nationkey < 5 ORDER BY 1, 2""",
    ),
    (
        "scalar_subquery_in_select_region",  # subquery_in_select.q (positive half)
        """SELECT r_name,
             (SELECT COUNT(*) FROM nation WHERE n_regionkey = r_regionkey) AS n
           FROM region ORDER BY r_name""",
    ),
    (
        "except_all_shape",  # except_all.q (beyond-1.x setop)
        """SELECT n_regionkey FROM nation EXCEPT ALL SELECT r_regionkey FROM region
           ORDER BY n_regionkey LIMIT 10""",
    ),
    (
        "intersect_all_shape",  # intersect_all.q
        """SELECT n_regionkey FROM nation INTERSECT ALL
           SELECT n_regionkey FROM nation WHERE n_nationkey < 10 ORDER BY n_regionkey""",
    ),
    (
        "windows_mixed_frames",  # windowing.q: ROWS frame rolling sum
        """SELECT o_orderkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_orderstatus
               ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll
           FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey""",
    ),
    (
        "ntile_distribution",  # windowing_ntile.q
        """SELECT b, COUNT(1) AS c FROM
             (SELECT NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS b FROM customer) t
           GROUP BY b ORDER BY b""",
    ),
    (
        "first_last_value_window",  # windowing.q first_value/last_value
        """SELECT o_orderstatus, o_orderkey,
             FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS fv,
             LAST_VALUE(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
           FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderstatus, o_orderkey""",
    ),
    (
        "date_extract_matrix",  # udf_year/month/day
        """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
             day(o_orderdate) AS d FROM orders WHERE o_orderkey <= 12 ORDER BY o_orderkey""",
    ),
    (
        "date_add_arithmetic",  # date arithmetic via INTERVAL (udf_date_add
        # itself returns DATE on Spark, TIMESTAMP-typed text on DuckDB)
        """SELECT o_orderkey, o_orderdate + INTERVAL 30 DAY AS plus30
             FROM orders WHERE o_orderkey <= 8 ORDER BY o_orderkey""",
    ),
    (
        "string_concat_ws",  # udf_concat_ws.q (+ substr tail; split()[i]
        # indexing differs 0- vs 1-based across engines — documented drop)
        """SELECT concat_ws('-', n_name, CAST(n_regionkey AS STRING)) AS cw,
             substr(n_name, 8) AS tail FROM nation ORDER BY n_name LIMIT 6""",
    ),
    (
        "udf_instr_position",  # udf_instr.q
        """SELECT instr(n_name, '_') AS i, position('_' IN n_name) AS p
             FROM nation ORDER BY n_name LIMIT 4""",
    ),
    (
        "udf_pad_functions",  # udf_lpad.q / udf_rpad.q
        """SELECT lpad(n_name, 12, '*') AS lp, rpad(n_name, 12, '#') AS rp
             FROM nation WHERE n_nationkey < 4 ORDER BY n_name""",
    ),
    (
        "udf_if_nvl",  # udf_if.q / udf_nullif
        """SELECT if(n_regionkey = 0, 'zero', 'nonzero') AS i,
             nullif(n_regionkey, 0) AS nf FROM nation ORDER BY n_nationkey LIMIT 6""",
    ),
    (
        "substr_negative_start_only",  # udf_substr.q: negative start counts
        # from the end on both engines
        "SELECT substr(n_name, -3) AS s FROM nation ORDER BY n_name LIMIT 5",
    ),
]


# --- round 6, tranche 38: udf_*/groupby*/ppd_*/having* long tail.
# Every shape prototyped against BOTH engines before landing; grounded
# ports name their clientpositive source script. Portability drops
# found while prototyping (documented, not ported):
#   - regexp_replace: DuckDB replaces the FIRST match unless given the
#     'g' flag, Spark replaces ALL and takes no flag arg — the same
#     text cannot agree (regexp_extract ported instead);
#   - char_length: no DuckDB spelling (length() already ported);
#   - find_in_set / space / soundex / hex-sha digests: no shared
#     name or semantics across the two engines.
QSCRIPTS_R38 = [
    (
        "case_value_form",  # udf_case.q: CASE <expr> WHEN value form
        """SELECT n_nationkey, CASE n_regionkey WHEN 0 THEN 'zero'
             WHEN 1 THEN 'one' ELSE 'many' END AS c
           FROM nation ORDER BY n_nationkey LIMIT 10""",
    ),
    (
        "case_no_else_null_nation",  # udf_when.q: searched CASE, missing ELSE -> NULL
        """SELECT n_nationkey, CASE WHEN n_regionkey = 0 THEN 'zero' END AS c
           FROM nation ORDER BY n_nationkey LIMIT 10""",
    ),
    (
        "between_expr_arith",  # udf_between.q: BETWEEN over arithmetic
        # on both the probe and the bounds
        """SELECT COUNT(*) AS n FROM orders
           WHERE o_orderkey + 100 BETWEEN (150 + -50) AND (150 + 500)""",
    ),
    (
        "not_between_count",  # udf_between.q: NOT BETWEEN
        "SELECT COUNT(*) AS n FROM nation WHERE n_nationkey NOT BETWEEN 5 AND 20",
    ),
    (
        "instr_basic",  # udf_instr.q: 0 for no match, 1-based index
        "SELECT n_name, instr(n_name, 'AN') AS i FROM nation ORDER BY n_name LIMIT 8",
    ),
    (
        "position_in",  # udf_locate.q: locate ported as ANSI
        # position(x IN y) — the one spelling both engines share
        "SELECT n_name, position('A' IN n_name) AS p FROM nation ORDER BY n_name LIMIT 8",
    ),
    (
        "lpad_truncates",  # udf_lpad.q: pad len < input TRUNCATES
        """SELECT lpad(n_name, 3, '?') AS l, rpad(n_name, 12, '.') AS r
           FROM nation ORDER BY n_name LIMIT 6""",
    ),
    (
        "translate_map",  # udf_translate.q: per-char mapping
        "SELECT translate(n_name, 'AEIOU', 'aeiou') AS t FROM nation ORDER BY n_name LIMIT 6",
    ),
    (
        "least_greatest_strings_mixed_cols",  # udf_least.q / udf_greatest.q:
        # lexicographic + numeric forms
        """SELECT least('C','a','B') AS l1, greatest('AAA','AaA','AAa') AS g1,
             least(n_nationkey, n_regionkey) AS l2
           FROM nation ORDER BY n_nationkey LIMIT 5""",
    ),
    (
        "least_with_null",  # udf_greatest.q: NULL args are SKIPPED by
        # both engines (Hive 1.2 returned NULL — semantics delta is
        # Spark-side, identical in DuckDB, so the port pins the
        # modern shared behavior)
        "SELECT least(n_nationkey, NULL) AS l FROM nation ORDER BY n_nationkey LIMIT 5",
    ),
    (
        "repeat_edge",  # udf_repeat.q: zero-count -> empty string
        "SELECT repeat('asd', 0) AS r0, repeat('x', 3) AS r3 FROM nation LIMIT 1",
    ),
    (
        "reverse_str",  # udf_reverse.q
        "SELECT reverse(n_name) AS r FROM nation ORDER BY n_name LIMIT 6",
    ),
    (
        "ascii_fn",  # udf_ascii.q: first-byte code, '' -> 0
        "SELECT ascii(n_name) AS a, ascii('') AS e FROM nation ORDER BY n_name LIMIT 6",
    ),
    (
        "groupby_substr_key",  # groupby_ppr.q: substr() group key +
        # DISTINCT agg + concat(key, agg) in one grouped select
        """SELECT substr(o_orderpriority, 1, 1) AS k,
             COUNT(DISTINCT o_orderstatus) AS cd,
             concat(substr(o_orderpriority, 1, 1), CAST(COUNT(*) AS STRING)) AS ck
           FROM orders GROUP BY substr(o_orderpriority, 1, 1) ORDER BY k""",
    ),
    (
        "ppd_gby_or_filter",  # ppd_gby.q: outer filter mixing the
        # group key and the aggregate through OR (only the key half
        # may push below the aggregate)
        """SELECT c1 FROM (
             SELECT o_orderpriority AS c1, COUNT(o_orderkey) AS c2
             FROM orders WHERE o_orderpriority > '1' GROUP BY o_orderpriority
           ) s WHERE c1 > '2' AND (c2 > 30 OR c1 < '5') ORDER BY c1""",
    ),
    (
        "ppd_gby_join",  # ppd_gby_join.q: join of two filtered
        # subqueries then regroup
        """SELECT a.k, COUNT(1) AS n FROM
             (SELECT n_regionkey AS k FROM nation WHERE n_nationkey > 2) a
           JOIN (SELECT r_regionkey AS k FROM region WHERE r_regionkey < 4) b
             ON a.k = b.k GROUP BY a.k ORDER BY a.k""",
    ),
    (
        "join_union_subquery",  # auto_join27.q: UNION ALL subquery as
        # a join side
        """SELECT u.k, r.r_name FROM (
             SELECT n_regionkey AS k FROM nation WHERE n_nationkey < 5
             UNION ALL SELECT r_regionkey AS k FROM region
           ) u JOIN region r ON u.k = r.r_regionkey ORDER BY u.k, r.r_name""",
    ),
    (
        "having_multi_conditions",  # having2.q: AND of two aggregates
        """SELECT o_custkey, COUNT(*) AS n, SUM(o_totalprice) AS s
           FROM orders GROUP BY o_custkey
           HAVING COUNT(*) > 3 AND SUM(o_totalprice) > 500000
           ORDER BY o_custkey LIMIT 20""",
    ),
    (
        "pow_round",  # udf_pow.q: power + sqrt, rounded for float parity
        """SELECT round(power(n_nationkey, 2), 6) AS p,
             round(sqrt(n_nationkey), 6) AS sq
           FROM nation ORDER BY n_nationkey LIMIT 8""",
    ),
    (
        "exp_ln_log",  # udf_exp.q / udf_ln.q / udf_log10.q
        """SELECT round(exp(1), 6) AS e, round(ln(n_nationkey + 1), 6) AS l,
             round(log10(n_nationkey + 1), 6) AS l10
           FROM nation ORDER BY n_nationkey LIMIT 6""",
    ),
    (
        "degrees_radians_sign",  # udf_degrees.q / udf_radians.q /
        # udf_sign.q (sign cast: Spark returns DOUBLE, DuckDB BIGINT)
        """SELECT round(degrees(1), 6) AS d, round(radians(180), 6) AS r,
             CAST(sign(n_nationkey - 10) AS INT) AS sg
           FROM nation ORDER BY n_nationkey LIMIT 12""",
    ),
    (
        "bitwise_and_or",  # udf_bitwise_and.q / udf_bitwise_or.q
        """SELECT n_nationkey & 3 AS ba, n_nationkey | 8 AS bo
           FROM nation ORDER BY n_nationkey LIMIT 8""",
    ),
    (
        "concat_ws_strings",  # udf_concat_ws.q
        """SELECT concat_ws('-', n_name, CAST(n_regionkey AS STRING)) AS c
           FROM nation ORDER BY n_name LIMIT 6""",
    ),
    (
        "trim_family",  # udf_trim.q: trim/ltrim/rtrim
        "SELECT trim('  x  ') AS t, ltrim('  x') AS l, rtrim('x  ') AS r FROM nation LIMIT 1",
    ),
    (
        "regexp_extract_group_single",  # udf_regexp_extract.q: group index arg
        "SELECT regexp_extract(n_name, '([A-Z]+)', 1) AS g FROM nation ORDER BY n_name LIMIT 6",
    ),
    (
        "ifnull_fn",  # udf_nvl.q: nvl ported as ifnull — the spelling
        # both engines share
        """SELECT ifnull(NULL, 'x') AS i1, ifnull(n_name, 'y') AS i2
           FROM nation ORDER BY n_name LIMIT 4""",
    ),
    (
        "levenshtein_fn",  # udf_levenshtein.q
        "SELECT levenshtein(n_name, 'FRANCE') AS d FROM nation ORDER BY n_name LIMIT 8",
    ),
    (
        "groupby_ordinals",  # groupby_position.q: GROUP BY 1 / ORDER BY 1
        "SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY 1 ORDER BY 1",
    ),
    (
        "distinct_mixed_aggs",  # groupby_distinct_samekey.q: DISTINCT
        # and plain aggregates over different columns in one group
        """SELECT o_orderstatus, COUNT(DISTINCT o_orderpriority) AS cd,
             SUM(DISTINCT o_custkey % 10) AS sd, COUNT(*) AS n
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "not_distinct_from_join",  # join_nullsafe.q: Hive <=> ported as
        # ANSI IS NOT DISTINCT FROM — the spelling both engines share
        """SELECT a.n_nationkey FROM nation a JOIN nation b
             ON a.n_regionkey IS NOT DISTINCT FROM b.n_regionkey
             AND a.n_nationkey = b.n_nationkey
           ORDER BY a.n_nationkey LIMIT 10""",
    ),
    (
        "limit_offset_nation_tail",  # limit_pushdown.q lineage; OFFSET is the
        # post-1.2 ANSI form both engines share
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5 OFFSET 10",
    ),
    (
        "order_by_expr_alias_mix",  # order2.q: ORDER BY select alias
        """SELECT n_name, n_nationkey * 2 AS dbl FROM nation
           ORDER BY dbl DESC, n_name LIMIT 6""",
    ),
    (
        "union_distinct_three",  # union3.q: three-branch UNION DISTINCT
        # with a constant branch
        """SELECT n_regionkey AS k FROM nation UNION
           SELECT r_regionkey FROM region UNION SELECT 99 ORDER BY k""",
    ),
    (
        "join_three_way_mixed_outer",  # join28.q: chained LEFT OUTERs,
        # the second with an extra ON-side filter
        """SELECT n.n_name, r.r_name, s.s_name
           FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
           LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey AND s.s_suppkey < 5
           ORDER BY n.n_name, s.s_name""",
    ),
    (
        "corr_exists_agg",  # subquery_exists_having.q: correlated
        # EXISTS whose subquery groups and filters on HAVING
        """SELECT r_name FROM region r WHERE EXISTS (
             SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey
             GROUP BY n.n_regionkey HAVING COUNT(*) >= 5
           ) ORDER BY r_name""",
    ),
    (
        "case_in_groupby",  # udf_case.q lineage: CASE as the group key
        # via ordinal
        """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
             WHEN o_totalprice < 200000 THEN 'mid' ELSE 'high' END AS band,
             COUNT(*) AS n
           FROM orders GROUP BY 1 ORDER BY band""",
    ),
    (
        "nullif_zero_guard",  # ANSI nullif (shared spelling) guarding
        # a divide-by-zero in an aggregate expression
        """SELECT o_custkey, SUM(o_totalprice) / nullif(COUNT(*) - 1, 0) AS avg_rest
           FROM orders GROUP BY o_custkey ORDER BY o_custkey LIMIT 12""",
    ),
    (
        "string_concat_pipes",  # udf_concat.q ported as ANSI || — the
        # spelling both engines share
        """SELECT n_name || '-' || CAST(n_regionkey AS STRING) AS c
           FROM nation ORDER BY n_name LIMIT 6""",
    ),
    (
        "in_tuple_list",  # udf_in.q: row-constructor IN over tuples
        """SELECT COUNT(*) AS n FROM nation
           WHERE (n_regionkey, n_nationkey < 10) IN ((0, true), (1, false))""",
    ),
    (
        "interval_date_add",  # Hive 1.2 INTERVAL arithmetic
        # (HIVE-9792 era) — DATE + INTERVAL DAY
        """SELECT o_orderdate + INTERVAL 30 DAY AS d FROM orders
           ORDER BY o_orderkey LIMIT 5""",
    ),
]


# --- round 6, tranche 40: math/string/subquery remainder. Prototyped
# against both engines; drops documented here:
#   - octet_length / bit_length / initcap / width_bucket: no DuckDB
#     spelling;
#   - concat(x, NULL): Spark NULL-propagates (Hive semantics), DuckDB
#     treats NULL as '' — the same text cannot agree;
#   - DATE + INTERVAL: DuckDB widens to TIMESTAMP, Spark stays DATE
#     (ported earlier with an explicit CAST — not repeated here).
QSCRIPTS_R40 = [
    (
        "round_half_and_negative_scale",  # udf_round.q: half-away-from-
        # zero + negative scale rounds to tens/hundreds
        """SELECT round(2.5) AS a, round(-2.5) AS b,
             round(1234.567, -2) AS c, round(1234.567, 1) AS d
           FROM nation LIMIT 1""",
    ),
    (
        "ceil_floor_negative",  # udf_ceil.q / udf_ceiling.q / udf_floor.q
        "SELECT ceil(-1.5) AS cf, floor(-1.5) AS ff, ceiling(2.1) AS cg FROM nation LIMIT 1",
    ),
    (
        "mod_fn",  # udf_modulo.q: mod() function form (pmod has no
        # DuckDB twin — documented drop in tranche 37)
        "SELECT mod(n_nationkey, 7) AS m FROM nation ORDER BY n_nationkey LIMIT 8",
    ),
    (
        "pi_fn",  # udf_pi.q
        "SELECT round(pi(), 6) AS p FROM nation LIMIT 1",
    ),
    (
        "trig_suite",  # udf_sin.q / udf_cos.q / udf_atan.q / udf_asin.q
        """SELECT round(sin(1), 6) AS s, round(cos(1), 6) AS c,
             round(atan2(1, 2), 6) AS a2, round(asin(0.5), 6) AS asn
           FROM nation LIMIT 1""",
    ),
    (
        "split_part_fn",  # udf_split.q lineage: split()[i] indexing
        # differs 0- vs 1-based (documented drop), but split_part is
        # 1-based in BOTH engines — the portable spelling
        """SELECT split_part(n_name, 'A', 1) AS p1,
             split_part(n_name, 'A', 2) AS p2
           FROM nation ORDER BY n_name LIMIT 6""",
    ),
    (
        "left_right_fns",  # udf_substr.q lineage: ANSI left/right
        "SELECT left(n_name, 3) AS l, right(n_name, 3) AS r FROM nation ORDER BY n_name LIMIT 6",
    ),
    (
        "contains_fn",  # shared modern spelling of instr(...) > 0
        "SELECT n_name, contains(n_name, 'AN') AS c FROM nation ORDER BY n_name LIMIT 8",
    ),
    (
        "substr_past_end",  # udf_substr.q: start beyond length -> '',
        # length overrun clamps
        """SELECT substr(n_name, 100) AS s, substr(n_name, 2, 1000) AS t
           FROM nation ORDER BY n_name LIMIT 4""",
    ),
    (
        "greatest_mixed_numeric",  # udf_greatest.q: expression args
        """SELECT greatest(n_nationkey, n_regionkey * 3, 7) AS g
           FROM nation ORDER BY n_nationkey LIMIT 10""",
    ),
    (
        "abs_fn",  # udf_abs.q
        "SELECT abs(n_nationkey - 12) AS a FROM nation ORDER BY n_nationkey LIMIT 8",
    ),
    (
        "log_base",  # udf_log.q: explicit-base log
        "SELECT round(log(2, 8), 6) AS l FROM nation LIMIT 1",
    ),
    (
        "power_negative_base",  # udf_pow.q: negative base, integer exp
        "SELECT round(power(-2, 3), 6) AS p FROM nation LIMIT 1",
    ),
    (
        "exists_uncorrelated",  # subquery_exists.q: uncorrelated EXISTS
        # keeps or drops ALL outer rows
        """SELECT r_name FROM region WHERE EXISTS
             (SELECT 1 FROM nation WHERE n_nationkey > 20) ORDER BY r_name""",
    ),
    (
        "in_subquery_with_agg",  # subquery_in_having.q lineage: IN over
        # a grouped+HAVING subquery
        """SELECT n_name FROM nation WHERE n_regionkey IN (
             SELECT r_regionkey FROM region GROUP BY r_regionkey
             HAVING COUNT(*) = 1
           ) ORDER BY n_name LIMIT 10""",
    ),
]


# --- round 6, tranche 41: union_remove/auto_join/ppd_outer_join/null
# families. Prototyped against both engines; all candidates ported
# (no drops this tranche — the LIMIT-inside-union shape needed an
# ORDER BY inside each limited subquery to be deterministic, which is
# also what input26.q itself does on its first branch).
QSCRIPTS_R41 = [
    (
        "union_same_grouped_branch_twice",  # union_remove_1.q: UNION ALL
        # of two identical grouped branches (the union-remove rewrite)
        """SELECT * FROM (
             SELECT o_orderstatus AS k, COUNT(1) AS vals FROM orders GROUP BY o_orderstatus
             UNION ALL
             SELECT o_orderstatus AS k, COUNT(1) AS vals FROM orders GROUP BY o_orderstatus
           ) a ORDER BY k, vals""",
    ),
    (
        "left_outer_overlapping_range_subqs",  # auto_join4.q: LEFT OUTER
        # between two filtered subselects with overlapping key ranges
        """SELECT a.c1, a.c2, b.c3, b.c4 FROM
             (SELECT n_nationkey AS c1, n_name AS c2 FROM nation
              WHERE n_nationkey > 10 AND n_nationkey < 20) a
           LEFT OUTER JOIN
             (SELECT n_nationkey AS c3, n_name AS c4 FROM nation
              WHERE n_nationkey > 15 AND n_nationkey < 25) b
           ON a.c1 = b.c3 ORDER BY a.c1""",
    ),
    (
        "join_subselects_nonequi_on",  # auto_join11.q: subselect join
        # with an extra non-equi ON conjunct, aggregated
        """SELECT SUM(s1.c1 + s2.c3) AS s FROM
             (SELECT n_nationkey AS c1 FROM nation) s1 JOIN
             (SELECT n_nationkey AS c3 FROM nation) s2
           ON s1.c1 = s2.c3 AND s1.c1 < 10""",
    ),
    (
        "union_of_limited_subqs_agg",  # input26.q: UNION ALL of two
        # ordered+limited subqueries, AGGREGATED outside (differentiated
        # r11 — was a literal dup of union_of_limited_subqueries)
        """SELECT COUNT(*) AS n, MIN(o_orderkey) AS mn FROM (
             SELECT * FROM (SELECT o_orderkey FROM orders
               WHERE o_orderstatus = 'F' ORDER BY o_orderkey LIMIT 7) pa
             UNION ALL
             SELECT * FROM (SELECT o_orderkey FROM orders
               WHERE o_orderstatus = 'O' ORDER BY o_orderkey DESC LIMIT 3) pb
           ) subq""",
    ),
    (
        "self_outer_join_const_on_filters",  # join_filters_overlap.q:
        # self LEFT OUTER chain whose ON clauses pin BOTH sides with
        # constant filters (left rows always survive, match rarely)
        """SELECT a.n_nationkey, b.n_nationkey AS bk, c.n_nationkey AS ck
           FROM nation a
           LEFT OUTER JOIN nation b
             ON a.n_nationkey = b.n_nationkey AND a.n_regionkey = 2 AND b.n_regionkey = 2
           LEFT OUTER JOIN nation c
             ON a.n_nationkey = c.n_nationkey AND a.n_regionkey = 3 AND c.n_regionkey = 3
           ORDER BY a.n_nationkey""",
    ),
    (
        "part_self_join_filtered",  # join_merging.q: part self
        # LEFT OUTER with a right-side-only ON filter
        """SELECT p1.p_partkey, p2.p_brand
           FROM part p1 LEFT OUTER JOIN part p2
           ON p1.p_partkey = p2.p_partkey AND p2.p_size > 25
           ORDER BY p1.p_partkey LIMIT 25""",
    ),
    (
        "typed_null_columns",  # null_column.q: typed NULL projections
        """SELECT CAST(NULL AS INT) AS a, CAST(NULL AS STRING) AS b, n_nationkey
           FROM nation ORDER BY n_nationkey LIMIT 4""",
    ),
    (
        "aggregates_over_empty_input",  # nullgroup.q: global aggregates
        # over zero rows — COUNT 0, SUM/MAX NULL
        """SELECT COUNT(*) AS c, SUM(n_nationkey) AS s, MAX(n_name) AS m
           FROM nation WHERE n_nationkey < 0""",
    ),
    (
        "where_on_outer_side_becomes_inner",  # ppd_outer_join1.q: WHERE
        # on the nullable side collapses LEFT OUTER to inner
        """SELECT n.n_name, r.r_name FROM nation n
           LEFT OUTER JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE r.r_name > 'A' ORDER BY n_name""",
    ),
    (
        "join_reorder_three_filters",  # join_reorder.q: three-table
        # chain with selective filters on both ends
        """SELECT n.n_name, r.r_name, s.s_suppkey FROM supplier s
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE s.s_acctbal > 5000 AND r.r_regionkey IN (1, 2)
           ORDER BY s.s_suppkey LIMIT 20""",
    ),
    (
        "union_with_nulls_branch",  # union_null.q: an all-NULL branch
        # unioned in, NULLS FIRST ordering pinned
        """SELECT k, v FROM (
             SELECT n_nationkey AS k, n_name AS v FROM nation WHERE n_nationkey < 3
             UNION ALL SELECT NULL AS k, NULL AS v
           ) u ORDER BY k NULLS FIRST, v""",
    ),
    (
        "groupby_multi_aggs_single_pass",  # groupby_multi_single_reducer.q
        """SELECT o_orderstatus, COUNT(*) AS c, MIN(o_totalprice) AS mn,
             MAX(o_totalprice) AS mx, round(AVG(o_totalprice), 2) AS av
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "nested_subquery_three_deep",  # subq2.q: three nesting levels
        # collapse into one grouped scan
        """SELECT * FROM (
             SELECT k, COUNT(*) AS n FROM (
               SELECT o_orderpriority AS k FROM (
                 SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000
               ) x
             ) y GROUP BY k
           ) z ORDER BY k""",
    ),
    (
        "cross_join_filtered_to_theta",  # cross_join.q: CROSS JOIN whose
        # WHERE makes it a theta join
        """SELECT a.r_regionkey, b.r_regionkey AS bk FROM region a CROSS JOIN region b
           WHERE a.r_regionkey < b.r_regionkey ORDER BY a.r_regionkey, bk""",
    ),
]


# --- round 6, tranche 42: the last unported windowing/leadlag family
# scripts. Window sums over DOUBLE partitions are rounded to 2dp in
# BOTH engines — the per-partition fold order differs (1e-8-scale
# float drift on a 60-row partition, observed while prototyping).
QSCRIPTS_R42 = [
    (
        "multi_partition_windows_one_select",  # windowing_multipartitioning.q:
        # two window functions with DIFFERENT partitionings in one select
        """SELECT o_orderkey,
             RANK() OVER (PARTITION BY o_orderstatus
                          ORDER BY o_totalprice DESC, o_orderkey) AS r1,
             round(SUM(o_totalprice) OVER (PARTITION BY o_orderpriority), 2) AS s2
           FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""",
    ),
    (
        "named_windows_two_partitions",  # windowing_multipartitioning.q:
        # two named WINDOW specs with different partitions
        """SELECT o_orderkey,
             RANK() OVER w1 AS r1, RANK() OVER w2 AS r2
           FROM orders WHERE o_orderkey <= 100
           WINDOW w1 AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey),
                  w2 AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey)
           ORDER BY o_orderkey""",
    ),
    (
        "leadlag_offsets_and_defaults",  # leadlag.q: explicit offsets,
        # an explicit default, NULL tail
        """SELECT o_orderkey,
             LEAD(o_totalprice, 2) OVER (ORDER BY o_orderkey) AS ld2,
             LAG(o_totalprice, 1, -1.0) OVER (ORDER BY o_orderkey) AS lg1
           FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey""",
    ),
    (
        "leadlag_expression_args",  # leadlag_queries.q: lead over an
        # expression argument, partitioned
        """SELECT o_orderkey,
             LEAD(o_totalprice * 2, 1) OVER (PARTITION BY o_orderstatus
                                             ORDER BY o_orderkey) AS ld
           FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""",
    ),
    (
        "rank_dense_percent_together",  # windowing_rank.q: rank /
        # dense_rank / percent_rank side by side (ties via status)
        """SELECT o_orderkey,
             RANK() OVER (ORDER BY o_orderstatus, o_orderkey) AS r,
             DENSE_RANK() OVER (ORDER BY o_orderstatus) AS dr,
             round(PERCENT_RANK() OVER (ORDER BY o_orderstatus, o_orderkey), 6) AS pr
           FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey""",
    ),
    (
        "window_sum_no_order_whole_partition",  # windowing_multipartitioning.q:
        # no ORDER BY -> whole-partition frame
        """SELECT o_orderkey, o_orderstatus,
             round(SUM(o_totalprice) OVER (PARTITION BY o_orderstatus), 2) AS tot
           FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey""",
    ),
]


# --- round 6, tranche 43: input* family select shapes (isnull() has
# no DuckDB spelling — IS NULL ported instead, folded into the first
# shape's COUNT(CASE) form).
QSCRIPTS_R43 = [
    (
        "null_equals_null_matches_nothing",  # input9.q: NULL = NULL is
        # NULL, so the predicate admits no row
        """SELECT COUNT(*) AS n,
             COUNT(CASE WHEN NULL = NULL THEN 1 END) AS m FROM nation""",
    ),
    (
        "star_plus_computed_alias",  # input22.q: star expansion plus a
        # re-aliased column in the same subquery select
        """SELECT a.k2 FROM (SELECT nation.*, n_nationkey AS k2 FROM nation) a
           ORDER BY a.k2 LIMIT 10""",
    ),
    (
        "typed_in_lists_conjunction",  # input49.q: IN lists over
        # differently-typed columns ANDed together
        """SELECT COUNT(*) AS n FROM orders
           WHERE o_orderstatus IN ('F', 'O') AND o_custkey IN (1, 2, 4, 7)
             AND o_totalprice > 1000.0""",
    ),
    (
        "union_of_two_counts",  # input41.q: UNION ALL of two global
        # aggregates, reselected
        """SELECT cnt FROM (
             SELECT COUNT(1) AS cnt FROM nation
             UNION ALL SELECT COUNT(1) AS cnt FROM region) u ORDER BY cnt""",
    ),
]


# --- round 6, tranche 44: ppd_* family — predicate placement around
# subqueries, unions, and CASE (all candidates ported).
QSCRIPTS_R44 = [
    (
        "ppd_three_subq_joins_mixed_filters",  # ppd_join2.q: three
        # filtered subqueries chained with residual WHERE mixing
        # disjunctions and a non-pushable sqrt()
        """SELECT s1.c1, s2.c4 FROM
             (SELECT n_nationkey AS c1, n_regionkey AS c2 FROM nation WHERE n_nationkey <> 3) s1
           JOIN (SELECT n_nationkey AS c3, n_name AS c4 FROM nation WHERE n_nationkey <> 5) s2
             ON s1.c1 = s2.c3 AND s1.c1 < 20
           JOIN (SELECT r_regionkey AS c5 FROM region WHERE r_regionkey <> 0) s3
             ON s1.c2 = s3.c5
           WHERE s1.c1 <> 11 AND (s1.c2 <> 2 OR s1.c1 > 1) AND sqrt(s3.c5) <> 13
           ORDER BY s1.c1""",
    ),
    (
        "ppd_filter_above_union",  # ppd_union.q: outer filter must
        # reach both union branches
        """SELECT u.k, u.v FROM (
             SELECT o_orderkey AS k, o_orderstatus AS v FROM orders WHERE o_orderkey < 100
             UNION ALL
             SELECT o_orderkey AS k, o_orderstatus AS v FROM orders WHERE o_orderkey > 150
           ) u WHERE u.k <> 7 AND u.v = 'F' ORDER BY u.k LIMIT 30""",
    ),
    (
        "ppd_case_in_where",  # ppd_udf_case.q: CASE expression as the
        # WHERE predicate
        """SELECT n_name FROM nation
           WHERE CASE WHEN n_regionkey = 0 THEN 'africa' ELSE 'other' END = 'africa'
           ORDER BY n_name""",
    ),
    (
        "ppd_constant_where",  # ppd_constant_where.q: constant-folded
        # always-true conjunction
        "SELECT COUNT(*) AS n FROM nation WHERE 1 = 1 AND 'a' = 'a'",
    ),
    (
        "ppd_repeated_alias",  # ppd_repeated_alias.q: equal filters on
        # both sides of a self-join plus a cross-side residual
        """SELECT a.n_regionkey, b.n_regionkey AS bk FROM
             (SELECT * FROM nation WHERE n_nationkey < 10) a JOIN
             (SELECT * FROM nation WHERE n_nationkey < 15) b
             ON a.n_nationkey = b.n_nationkey
           WHERE a.n_regionkey = b.n_regionkey AND a.n_regionkey < 3
           ORDER BY a.n_nationkey""",
    ),
    (
        "ppd_expr_filter_through_subq",  # ppd_udf_col.q: filters over
        # COMPUTED subquery columns (arith + upper/LIKE)
        """SELECT c1 FROM
             (SELECT n_nationkey + 1 AS c1, upper(n_name) AS c2 FROM nation) x
           WHERE c1 > 10 AND c2 LIKE 'NATION_1%' ORDER BY c1""",
    ),
]


# --- round 6, tranche 45: cast/type-conversion/alias misc sweep (all
# candidates ported).
QSCRIPTS_R45 = [
    (
        "cast_chain_numeric_string",  # cast1.q: number -> string ->
        # number round-trip in arithmetic
        """SELECT CAST(CAST(n_nationkey AS STRING) AS BIGINT) + 1 AS c
           FROM nation ORDER BY c LIMIT 6""",
    ),
    (
        "cast_bool_int_roundtrip",  # type_cast_1.q: boolean <-> int
        "SELECT CAST(CAST(1 AS BOOLEAN) AS INT) AS a, CAST(CAST(0 AS BOOLEAN) AS INT) AS b FROM nation LIMIT 1",
    ),
    (
        "implicit_string_number_compare_count",  # implicit_cast1.q: string
        # literal against a numeric column
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderkey = '7'",
    ),
    (
        "notable_alias_qualified_where",  # notable_alias1.q: alias
        # qualification in WHERE and select
        "SELECT x.n_name FROM nation x WHERE x.n_regionkey = 1 ORDER BY x.n_name",
    ),
    (
        "between_strings_name_proj",  # udf_between.q: lexicographic BETWEEN
        """SELECT n_name FROM nation WHERE n_name BETWEEN 'NATION_1' AND 'NATION_3'
           ORDER BY n_name""",
    ),
    (
        "order_by_multiple_directions",  # order.q: mixed DESC/ASC keys
        "SELECT n_regionkey, n_name FROM nation ORDER BY n_regionkey DESC, n_name ASC LIMIT 10",
    ),
    (
        "distinct_multi_column",  # distinct_stats.q lineage: DISTINCT
        # over a column pair
        """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
           ORDER BY o_orderstatus, o_orderpriority""",
    ),
    (
        "scalar_subq_in_where_arith",  # subquery_exists.q family:
        # scalar subquery inside WHERE arithmetic
        """SELECT n_name FROM nation
           WHERE n_nationkey > (SELECT MAX(r_regionkey) FROM region) - 2
           ORDER BY n_name LIMIT 8""",
    ),
    (
        "coalesce_chain_columns",  # udf_coalesce.q: NULL-leading chain
        "SELECT coalesce(NULL, NULL, n_name, 'x') AS c FROM nation ORDER BY c LIMIT 5",
    ),
    (
        "string_comparison_case_sensitive",  # type_conversions_1.q
        # lineage: case-sensitive equality yields zero matches (the
        # COUNT row is the non-empty result)
        "SELECT COUNT(*) AS n FROM nation WHERE n_name = lower(n_name)",
    ),
]


# --- round 6, tranche 46: groupby/count remainder (drop documented:
# COUNT(DISTINCT a, b) multi-argument form has no DuckDB spelling —
# the single-column forms and the distinct-pair semantics are
# covered via concat-keyed counts in earlier tranches).
QSCRIPTS_R46 = [
    (
        "groupby_constant_cast_key",  # groupby_neg_float.q: negative
        # DECIMAL literal as a positional GROUP BY key, counted
        # (differentiated r11 — was a literal dup of groupby_constant_key)
        """SELECT CAST('-30.33' AS DECIMAL(6,2)) AS k, COUNT(*) AS n
           FROM nation GROUP BY 1""",
    ),
    (
        "count_distinct_multi_cols_grouped",  # count.q: several
        # DISTINCT aggregates over different columns in one group
        """SELECT o_orderstatus, COUNT(DISTINCT o_orderpriority) AS cb,
             COUNT(DISTINCT o_custkey % 100) AS cc,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS sd
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "groupby_then_order_limit",  # limit_pushdown.q: grouped agg
        # with expression input, ordered + limited
        """SELECT o_orderpriority, round(SUM(o_totalprice + 1), 2) AS s
           FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority LIMIT 20""",
    ),
    (
        "agg_count_nulls_excluded",  # count.q: COUNT(col) skips the
        # NULL a window LEAD leaves at the tail, COUNT(*) does not
        """SELECT COUNT(ld) AS cn, COUNT(*) AS ct FROM (
             SELECT LEAD(o_orderkey, 1) OVER (ORDER BY o_orderkey) AS ld
             FROM orders WHERE o_orderkey <= 40) x""",
    ),
]


# --- round 6, tranche 47: three-valued-logic and operator-semantics
# shapes (udf_in.q / udf_like.q / udf_logic* lineage) — the subtle
# NULL rules a port gets wrong first.
QSCRIPTS_R47 = [
    (
        "negative_modulo_truncation",  # udf_modulo.q: % truncates
        # toward zero on both engines (sign follows the dividend)
        "SELECT (-7) % 3 AS a, 7 % (-3) AS b, (-7) % (-3) AS c FROM nation LIMIT 1",
    ),
    (
        "in_list_null_element_count",  # udf_in.q: a NULL in the IN
        # list never matches but does not poison actual matches (the
        # per-row three-valued classification is the earlier
        # in_list_with_null_semantics shape; this pins the aggregate
        # count form)
        "SELECT COUNT(*) AS hit FROM nation WHERE n_regionkey IN (1, NULL)",
    ),
    (
        "like_with_escape",  # udf_like.q: ESCAPE clause makes _ literal
        "SELECT COUNT(*) AS n FROM nation WHERE n_name LIKE 'NATION!_1%' ESCAPE '!'",
    ),
    (
        "not_like_pattern",  # udf_like.q
        "SELECT COUNT(*) AS n FROM nation WHERE n_name NOT LIKE '%1%'",
    ),
    (
        "three_valued_or_and",  # udf_logic_java_boolean.q lineage:
        # NULL OR TRUE = TRUE, NULL AND FALSE = FALSE, NULL OR FALSE = NULL
        """SELECT (NULL OR TRUE) AS a, (NULL AND FALSE) AS b,
             (NULL OR FALSE) IS NULL AS c FROM nation LIMIT 1""",
    ),
]


# --- round 7, tranche 48: date arithmetic / string functions /
# EXISTS / conditional aggregation / FILTER clause. Prototyped on
# both engines first; portability drops documented: datediff (DuckDB
# wants a part name first argument), months_between / trunc(date) /
# initcap (absent in DuckDB), sort_array-over-collect_list (list
# aggregate spellings differ), DATE - DATE (interval in Spark,
# BIGINT days in DuckDB).
QSCRIPTS_R48 = [
    (
        "date_int_arithmetic",  # udf_date_add.q / udf_date_sub.q: the
        # ANSI DATE +/- INT form both engines share
        """SELECT o_orderkey, CAST(o_orderdate AS DATE) + 30 AS d30,
                  CAST(o_orderdate AS DATE) - 7 AS d7
           FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey""",
    ),
    (
        "last_day_fn",  # udf_last_day.q
        """SELECT DISTINCT last_day(o_orderdate) AS ld FROM orders
           WHERE o_orderkey <= 100 ORDER BY ld""",
    ),
    (
        "translate_fn",  # udf_translate.q: per-char mapping
        "SELECT n_nationkey, translate(n_name, 'AEIOU', 'aeiou') AS t FROM nation ORDER BY n_nationkey",
    ),
    (
        "lpad_rpad_strings",  # udf_lpad.q / udf_rpad.q
        """SELECT n_nationkey, lpad(n_name, 12, '.') AS l,
                  rpad(n_name, 14, '*') AS r FROM nation ORDER BY n_nationkey""",
    ),
    (
        "split_part_head_tail",  # udf_split.q ported to the split_part
        # spelling both engines share (1-based, returns '' past end)
        """SELECT n_name, split_part(n_name, '_', 1) AS head,
                  split_part(n_name, '_', 2) AS tail FROM nation ORDER BY n_name""",
    ),
    (
        "not_exists_anti_count",  # subquery_notexists.q
        """SELECT COUNT(*) AS n FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    ),
    (
        "nullif_zero_guard_division",  # udf_nullif lineage: the divide-by-zero
        # guard idiom; NULL result rows preserved
        """SELECT n_nationkey, n_nationkey / NULLIF(n_regionkey, 0)
                  AS ratio_null_when_zero
           FROM nation WHERE n_regionkey IN (0, 2) ORDER BY n_nationkey""",
    ),
    (
        "case_in_join_condition",  # join with CASE inside ON
        """SELECT COUNT(*) AS n FROM nation a JOIN region b
           ON (CASE WHEN a.n_regionkey > 2 THEN a.n_regionkey ELSE 0 END)
              = b.r_regionkey""",
    ),
    (
        "corr_exists_two_tables",  # subquery_exists.q second shape
        """SELECT r_name FROM region WHERE EXISTS
             (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey
              AND n_nationkey > 20) ORDER BY r_name""",
    ),
    (
        "conditional_agg_pivot",  # the manual-pivot CASE-in-SUM idiom
        """SELECT o_custkey,
                  SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS nf,
                  SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS no
           FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 8
           ORDER BY o_custkey""",
    ),
    (
        "agg_filter_clause_lineitem",  # ANSI FILTER (WHERE ...) on aggregates
        """SELECT l_returnflag,
                  COUNT(*) FILTER (WHERE l_quantity > 25) AS big,
                  COUNT(*) AS total
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ),
    (
        "greatest_null_prop",  # udf_greatest.q: NULL args skipped
        "SELECT greatest(n_nationkey, NULL, n_regionkey) AS g FROM nation ORDER BY n_nationkey LIMIT 6",
    ),
    (
        "between_dates_orders_year",  # date-typed BETWEEN
        """SELECT COUNT(*) AS n FROM orders
           WHERE o_orderdate BETWEEN DATE'1995-01-01' AND DATE'1995-12-31'""",
    ),
    (
        "union_mixed_all_distinct_precedence",  # union.q: left-assoc
        # precedence of mixed UNION / UNION ALL, counted (differentiated
        # r11 — was a literal dup of union_distinct_three)
        """SELECT k, COUNT(*) AS c FROM (
             SELECT n_regionkey AS k FROM nation
             UNION
             SELECT r_regionkey FROM region
             UNION ALL
             SELECT 0
           ) u GROUP BY k ORDER BY k""",
    ),
    (
        "self_join_inequality_region",  # joinneg lineage: < join condition
        """SELECT COUNT(*) AS n FROM region a JOIN region b
           ON a.r_regionkey < b.r_regionkey""",
    ),
    (
        "substr_instr_compose",  # udf_substr.q x udf_instr.q composition
        """SELECT n_name, substr(n_name, 1, instr(n_name, '_') - 1) AS prefix
           FROM nation WHERE instr(n_name, '_') > 0 ORDER BY n_name""",
    ),
    (
        "power_sqrt_abs",  # udf_power.q / udf_sqrt.q / udf_abs.q in
        # integer-exact form (perfect squares only)
        """SELECT n_nationkey, CAST(power(n_nationkey, 2) AS BIGINT) AS sq,
                  CAST(sqrt(CAST(n_nationkey * n_nationkey AS DOUBLE)) AS BIGINT) AS rt,
                  abs(n_nationkey - 12) AS ab
           FROM nation ORDER BY n_nationkey""",
    ),
]


# --- round 7, tranche 49: regex / windows / CTE-reuse / bitwise.
# Prototyped on both engines; drops documented: regexp predicate
# spellings differ (Spark RLIKE vs DuckDB regexp_matches — no shared
# name), xor() absent in DuckDB (only & and | are portable).
QSCRIPTS_R49 = [
    (
        "regexp_replace_anchored",  # udf_regexp_replace.q: $-anchored
        # single-match pattern — the one replace-count both engines
        # share (DuckDB replaces first match only; differentiated r11,
        # was a literal dup of regexp_replace_fn)
        "SELECT n_nationkey, regexp_replace(n_name, '_[0-9]+$', '#') AS masked FROM nation ORDER BY n_nationkey",
    ),
    (
        "in_list_mixed_hits",  # udf_in.q: literal IN list, partial hits
        "SELECT n_nationkey FROM nation WHERE n_nationkey IN (1, 3, 5, 7, 99) ORDER BY n_nationkey",
    ),
    (
        "order_nulls_first_explicit",  # explicit NULLS FIRST on a
        # nullable computed column
        """SELECT ratio FROM (SELECT n_nationkey / NULLIF(n_regionkey, 0) AS ratio
             FROM nation) ORDER BY ratio NULLS FIRST LIMIT 8""",
    ),
    (
        "limit_in_subquery",  # limit_pushdown.q: LIMIT inside a
        # derived table bounds the outer count
        """SELECT COUNT(*) AS n FROM
             (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 50) t""",
    ),
    (
        "window_named_clause_reuse",  # windowing.q: one WINDOW
        # definition shared by two functions
        """SELECT c_custkey, RANK() OVER w AS r, COUNT(*) OVER w AS n
           FROM customer WHERE c_custkey <= 50
           WINDOW w AS (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal DESC, c_custkey)
           ORDER BY c_custkey""",
    ),
    (
        "cume_dist_percent_rank",  # windowing_udaf.q family
        """SELECT n_nationkey, round(cume_dist() OVER (ORDER BY n_nationkey), 6) AS cd,
                  round(percent_rank() OVER (ORDER BY n_nationkey), 6) AS pr
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "nth_value_window",  # windowing expressions: nth_value with a
        # full-partition frame
        """SELECT n_nationkey,
                  nth_value(n_name, 2) OVER (PARTITION BY n_regionkey
                    ORDER BY n_nationkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                  AS second_name
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "variance_moments_exact",  # udaf_variance family reduced to
        # its exact integer moments (sum, sumsq, n) — the float
        # variance is derived, the moments are the portable core
        """SELECT l_returnflag,
                  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumsq,
                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
                  COUNT(*) AS n
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ),
    (
        "coalesce_left_join_default",  # join28.q lineage: COALESCE
        # filling the unmatched side of a LEFT JOIN
        """SELECT r_regionkey, COALESCE(x.cnt, 0) AS n FROM region
           LEFT JOIN (SELECT n_regionkey, COUNT(*) AS cnt FROM nation
                      WHERE n_nationkey > 20 GROUP BY n_regionkey) x
             ON r_regionkey = x.n_regionkey ORDER BY r_regionkey""",
    ),
    (
        "chained_cte_scalar_reuse",  # cte reused by two scalar
        # subqueries in one SELECT
        """WITH big AS (SELECT o_custkey, COUNT(*) AS n FROM orders
                        GROUP BY o_custkey HAVING COUNT(*) >= 10)
           SELECT (SELECT COUNT(*) FROM big) AS n_big,
                  (SELECT MAX(n) FROM big) AS max_n""",
    ),
]

# Tranche 50 (round 7): HAVING/ordinal/inline-VALUES/outer-join-ON
# themes from still-unharvested clientpositive families. All 16
# prototyped green on both engines at sf0.01 before inclusion;
# date_trunc needed an explicit DATE cast (Spark keeps timestamp,
# DuckDB narrows to date).
QSCRIPTS_R50 = [
    (
        "having_multi_agg",  # having.q family: two aggregate
        # predicates, one not in the select list
        """SELECT o_orderstatus, COUNT(*) AS n, MAX(o_totalprice) AS mx
           FROM orders GROUP BY o_orderstatus
           HAVING COUNT(*) > 5 AND MIN(o_totalprice) < 50000
           ORDER BY o_orderstatus""",
    ),
    (
        "groupby_ordinal",  # groupby_position.q: GROUP BY 1
        """SELECT o_orderpriority, COUNT(*) AS n
           FROM orders GROUP BY 1 ORDER BY 1""",
    ),
    (
        "orderby_unselected_expr",  # order2.q: ORDER BY an expression
        # absent from the projection
        """SELECT n_name FROM nation ORDER BY length(n_name), n_name""",
    ),
    (
        "outer_join_on_vs_where",  # join_filters.q: the ON-clause
        # filter keeps unmatched left rows (a WHERE would drop them)
        """SELECT r_name, n_name FROM region r
           LEFT JOIN nation n
             ON r_regionkey = n_regionkey AND n_nationkey < 5
           ORDER BY r_name, n_name""",
    ),
    (
        "union_distinct_then_all",  # union_distinct_2.q lineage:
        # UNION (distinct) composed with UNION ALL
        """SELECT x FROM (
             SELECT o_orderstatus AS x FROM orders
             UNION SELECT l_linestatus AS x FROM lineitem
             UNION ALL SELECT 'Z' AS x) u ORDER BY x""",
    ),
    (
        "scalar_subquery_compare",  # subquery_scalar.q: comparison
        # against an uncorrelated scalar aggregate
        """SELECT c_custkey, c_acctbal FROM customer
           WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.8 FROM customer)
           ORDER BY c_custkey""",
    ),
    (
        "agg_of_case_pivot",  # groupby_map_ppr.q lineage: manual
        # pivot via SUM(CASE ...)
        """SELECT l_returnflag,
                  SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS n_f,
                  SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS n_o
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ),
    (
        "values_inline_table",  # values clause as a derived table
        """SELECT t.k, t.v FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c'))
           AS t(k, v) ORDER BY t.k""",
    ),
    (
        "string_pad_trim",  # udf_lpad.q/udf_rpad.q/udf_trim.q
        """SELECT n_name, lpad(trim(n_name), 12, '.') AS padded,
                  rpad(n_name, 4, 'x') AS clipped
           FROM nation ORDER BY n_name""",
    ),
    (
        "distinct_over_window_subquery",  # windowing + outer DISTINCT
        """SELECT DISTINCT rnk FROM (
             SELECT rank() OVER (PARTITION BY n_regionkey
                                 ORDER BY n_nationkey) AS rnk
             FROM nation) x ORDER BY rnk""",
    ),
    (
        "groupby_computed_key",  # groupby expression key (substr)
        """SELECT substr(o_orderpriority, 1, 1) AS pri, COUNT(*) AS n
           FROM orders GROUP BY substr(o_orderpriority, 1, 1)
           ORDER BY pri""",
    ),
    (
        "full_outer_coalesced_key",  # join_1to1.q lineage: FULL OUTER
        # over two aggregates, COALESCE of the key sides
        """SELECT COALESCE(a.k, b.k) AS k, a.na, b.nb FROM
             (SELECT o_orderstatus AS k, COUNT(*) AS na FROM orders
              GROUP BY o_orderstatus) a
           FULL OUTER JOIN
             (SELECT l_linestatus AS k, COUNT(*) AS nb FROM lineitem
              GROUP BY l_linestatus) b
             ON a.k = b.k ORDER BY k""",
    ),
    (
        "explicit_cross_join_tiny",  # cross_join.q: explicit CROSS
        # JOIN against a 2-row derived table
        """SELECT r_name, q.tag FROM region
           CROSS JOIN (SELECT 'x' AS tag UNION ALL SELECT 'y') q
           ORDER BY r_name, q.tag""",
    ),
    (
        "date_trunc_month_rollup",  # timestamp truncation rollup;
        # CAST to DATE because Spark keeps timestamp and DuckDB
        # narrows — the cast is the portable spelling
        """SELECT CAST(date_trunc('month', ts) AS DATE) AS m, COUNT(*) AS n
           FROM events GROUP BY CAST(date_trunc('month', ts) AS DATE)
           ORDER BY m""",
    ),
    (
        "greatest_least_clamp",  # udf_greatest.q/udf_least.q: clamp
        """SELECT p_partkey, greatest(least(p_size, 40), 10) AS clamped
           FROM part ORDER BY p_partkey LIMIT 30""",
    ),
    (
        "nullif_guard_division",  # udf_nullif lineage: divide-by-zero
        # guard over aggregates
        """SELECT l_linenumber,
                  CAST(SUM(l_extendedprice) / nullif(SUM(l_quantity), 0) AS DOUBLE) AS unit
           FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""",
    ),
]

# Tranche 51 (round 7): aggregate/subquery/string themes. All 12
# prototyped green on both engines at sf0.01 (and non-vacuity
# probed at sf0.001) before inclusion; candidate group_by_all and
# between-strings shapes were dropped as collisions with existing
# corpus ids per the uniqueness rule (the collection-time assert
# caught the second one).
QSCRIPTS_R51 = [
    (
        "median_agg",  # udaf_percentile lineage: exact median
        """SELECT l_linenumber, median(l_quantity) AS med
           FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""",
    ),
    (
        "bool_and_or_agg",  # udaf boolean aggregates
        """SELECT o_orderstatus, bool_and(o_totalprice > 1000) AS all_big,
                  bool_or(o_totalprice > 400000) AS any_huge
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "try_cast_null",  # safe-cast: malformed input -> NULL
        """SELECT n_name, TRY_CAST(n_name AS INTEGER) AS as_int,
                  TRY_CAST(CAST(n_nationkey AS STRING) AS INTEGER) AS roundtrip
           FROM nation ORDER BY n_name""",
    ),
    (
        "having_global_agg",  # having.q: HAVING without GROUP BY
        """SELECT COUNT(*) AS n FROM lineitem HAVING COUNT(*) > 10""",
    ),
    (
        "sum_empty_is_null",  # agg null semantics: COUNT 0 but SUM NULL
        """SELECT COUNT(*) AS n, SUM(l_quantity) AS s
           FROM lineitem WHERE l_quantity > 1000000""",
    ),
    (
        "case_in_orderby",  # order by a CASE expression
        """SELECT o_orderpriority FROM orders GROUP BY o_orderpriority
           ORDER BY CASE WHEN o_orderpriority = '5-LOW' THEN 0 ELSE 1 END,
                    o_orderpriority""",
    ),
    (
        "correlated_scalar_select",  # scalar subquery in the SELECT list
        """SELECT r_name,
                  (SELECT COUNT(*) FROM nation
                   WHERE n_regionkey = r_regionkey) AS n_nations
           FROM region ORDER BY r_name""",
    ),
    (
        "not_exists_conjunct",  # NOT EXISTS with an extra conjunct
        """SELECT c_custkey FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM orders o
             WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
           ORDER BY c_custkey""",
    ),
    (
        "dense_rank_distinct_count",  # windowing trick: COUNT DISTINCT
        # via MAX(dense_rank)
        """SELECT l_returnflag, MAX(dr) AS n_distinct_qty FROM (
             SELECT l_returnflag, dense_rank() OVER (
               PARTITION BY l_returnflag ORDER BY l_quantity) AS dr
             FROM lineitem) x
           GROUP BY l_returnflag ORDER BY l_returnflag""",
    ),
    (
        "translate_chars",  # udf_translate.q
        """SELECT n_name, translate(n_name, 'AEIOU', 'aeiou') AS lowered_vowels
           FROM nation ORDER BY n_name""",
    ),
    (
        "intersect_all_dups",  # setop with duplicate preservation
        """SELECT x FROM (
             SELECT l_linestatus AS x FROM lineitem
             INTERSECT ALL SELECT o_orderstatus AS x FROM orders
           ) t ORDER BY x""",
    ),
    (
        "position_instr",  # udf_instr.q / position syntax
        """SELECT n_name, position('A' IN n_name) AS pos_a
           FROM nation ORDER BY n_name""",
    ),
]

# Tranche 52 (round 7): string/window/join-syntax themes, 9 shapes
# prototyped green on both engines at sf0.01; width_bucket and
# octet_length candidates dropped (DuckDB lacks/renames them — not
# portable as one text), in_tuple_list dropped as an id collision.
QSCRIPTS_R52 = [
    (
        "left_right_substr",  # udf left/right
        """SELECT n_name, left(n_name, 6) AS l6, right(n_name, 2) AS r2
           FROM nation ORDER BY n_name""",
    ),
    (
        "exists_or_exists",  # two correlated EXISTS joined by OR
        """SELECT r_regionkey FROM region r
           WHERE EXISTS (SELECT 1 FROM nation n
                         WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey < 2)
              OR EXISTS (SELECT 1 FROM nation n2
                         WHERE n2.n_regionkey = r.r_regionkey AND n2.n_nationkey > 22)
           ORDER BY r_regionkey""",
    ),
    (
        "window_sum_desc_rows",  # descending ORDER BY with a
        # forward-looking ROWS frame
        """SELECT o_orderkey, SUM(o_totalprice) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey DESC
             ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS fwd_sum
           FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""",
    ),
    (
        "cast_string_to_date_arith",  # date arithmetic on a cast column
        """SELECT o_orderkey, o_orderdate,
                  CAST(o_orderdate AS DATE) + 30 AS due
           FROM orders ORDER BY o_orderkey LIMIT 20""",
    ),
    (
        "string_repeat_concat",  # udf_repeat.q with computed count
        """SELECT n_nationkey, repeat('*', CAST(n_nationkey % 5 AS INT)) AS stars
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "mod_negative_operands",  # % sign semantics (both engines
        # return sign-of-dividend)
        """SELECT -7 % 3 AS a, 7 % -3 AS b, -7 % -3 AS c""",
    ),
    (
        "least_greatest_null",  # NULL-skipping greatest/least
        """SELECT greatest(1, NULL, 3) AS g, least(NULL, NULL) AS l""",
    ),
    (
        "nested_cte_union",  # two CTEs unioned then aggregated
        """WITH a AS (SELECT n_regionkey AS k FROM nation WHERE n_nationkey < 5),
                b AS (SELECT r_regionkey AS k FROM region)
           SELECT k, COUNT(*) AS n
           FROM (SELECT k FROM a UNION ALL SELECT k FROM b) u
           GROUP BY k ORDER BY k""",
    ),
    (
        "join_using_syntax",  # JOIN ... USING column merge
        """SELECT c_custkey, o_orderkey FROM customer c
           JOIN (SELECT o_custkey AS c_custkey, o_orderkey FROM orders) o
             USING (c_custkey)
           ORDER BY c_custkey, o_orderkey LIMIT 30""",
    ),
]

# Tranche 53 (round 7): operator/aggregate/rounding themes, 8 shapes
# prototyped green on both engines at sf0.01; case-no-else and
# negative-substr candidates dropped as id collisions.
QSCRIPTS_R53 = [
    (
        "concat_pipe_operator",  # || string concatenation operator
        """SELECT n_name || '/' || CAST(n_regionkey AS STRING) AS tag
           FROM nation ORDER BY tag""",
    ),
    (
        "distinct_star_count_sub",  # COUNT(*) over a DISTINCT subquery
        """SELECT COUNT(*) AS n FROM (
             SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) x""",
    ),
    (
        "union_in_cte_referenced_twice",  # one UNION CTE, two scalar
        # subquery consumers
        """WITH u AS (
             SELECT o_custkey AS k FROM orders WHERE o_totalprice > 350000
             UNION SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0)
           SELECT (SELECT COUNT(*) FROM u) AS total,
                  (SELECT MAX(k) FROM u) AS mx""",
    ),
    (
        "avg_of_distinct",  # AVG(DISTINCT ...)
        """SELECT l_linenumber, CAST(AVG(DISTINCT l_quantity) AS DOUBLE) AS adq
           FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""",
    ),
    (
        "where_in_constant_list_notin_null",  # IN + NOT IN constant
        # lists combined
        """SELECT n_nationkey FROM nation
           WHERE n_nationkey NOT IN (1, 2, 3) AND n_regionkey IN (0, 1)
           ORDER BY n_nationkey""",
    ),
    (
        "round_half_behavior",  # round() tie behavior on decimal
        # literals agrees cross-engine (HALF_UP on exact decimals)
        """SELECT round(2.5) AS a, round(3.5) AS b, round(-2.5) AS c,
                  round(2.25, 1) AS d""",
    ),
    (
        "window_over_empty_partition_col",  # global window (no
        # PARTITION BY): one total ordering
        """SELECT o_orderkey,
                  row_number() OVER (ORDER BY o_orderkey) AS rn
           FROM orders WHERE o_orderkey <= 50 ORDER BY o_orderkey""",
    ),
    (
        "nullif_same_different",  # nullif equal/unequal/string
        """SELECT nullif(1, 1) AS a, nullif(1, 2) AS b,
                  nullif('x', 'x') AS c""",
    ),
]

# ---------------------------------------------------------------- r8
# Fifty-fourth tranche: the unported families the r7 verdict named —
# groupby_sort_* (bucket-sorted agg shortcut SEMANTICS: the plan-level
# map-side-GBY shortcut is Catalyst's call, the RESULT must be
# identical whether or not it fires), semijoin.q's distinct shapes,
# ppd2/ppd_union_view/ppd_vc pushdown-through-nesting shapes, and the
# bucketmapjoin/bucketsortoptimize result-parity shapes. Ported onto
# the fixture tables; DISTRIBUTE/SORT BY respelled portably where
# DuckDB lacks the clause (the harness sorts rows, so ordering
# clauses carry no information here anyway).
QSCRIPTS_R54 = [
    (
        "gbysort_key_prefix_agg",  # groupby_sort_1.q: GROUP BY = the
        # sorted/bucketed key -> map-side shortcut eligible; result
        # parity is the portable contract
        """SELECT o_custkey, count(1) AS cnt
           FROM orders GROUP BY o_custkey""",
    ),
    (
        "gbysort_superset_key_agg",  # groupby_sort_1.q: GROUP BY a
        # SUPERSET of the sort key (no shortcut, same results)
        """SELECT o_custkey, o_orderstatus, count(1) AS cnt
           FROM orders GROUP BY o_custkey, o_orderstatus""",
    ),
    (
        "gbysort_through_subquery",  # groupby_sort_1.q: shortcut must
        # survive an identity subquery
        """SELECT k, count(1) AS cnt FROM
             (SELECT o_custkey AS k, o_orderstatus FROM orders) subq1
           GROUP BY k""",
    ),
    (
        "gbysort_nonsort_key_agg",  # groupby_sort_2.q: GROUP BY a
        # non-sorted column
        """SELECT o_orderpriority, count(1) AS cnt
           FROM orders GROUP BY o_orderpriority""",
    ),
    (
        "gbysort_key_expr_agg",  # groupby_sort_3.q: GROUP BY an
        # EXPRESSION over the key (no shortcut; exact results)
        """SELECT o_custkey % 10 AS kb, count(1) AS cnt
           FROM orders GROUP BY o_custkey % 10""",
    ),
    (
        "gbysort_filtered_prefix",  # groupby_sort_6.q: filter below
        # the agg keeps the shortcut legal
        """SELECT o_custkey, count(1) AS cnt FROM orders
           WHERE o_orderstatus = 'F' GROUP BY o_custkey""",
    ),
    (
        "gbysort_count_distinct_on_key",  # groupby_sort_7.q
        """SELECT o_custkey, count(DISTINCT o_orderpriority) AS cd
           FROM orders GROUP BY o_custkey HAVING count(1) > 2""",
    ),
    (
        "gbysort_distinct_on_key",  # groupby_sort_8.q: DISTINCT over
        # the sorted key == GROUP BY key with no aggregates
        """SELECT DISTINCT l_orderkey FROM lineitem
           WHERE l_orderkey < 200""",
    ),
    (
        "gbysort_union_of_aggs",  # groupby_sort_9.q: UNION ALL of two
        # per-key aggs, re-aggregated above
        """SELECT k, sum(cnt) AS total FROM (
             SELECT o_custkey AS k, count(1) AS cnt FROM orders
             WHERE o_orderstatus = 'O' GROUP BY o_custkey
             UNION ALL
             SELECT o_custkey AS k, count(1) AS cnt FROM orders
             WHERE o_orderstatus = 'F' GROUP BY o_custkey
           ) u GROUP BY k""",
    ),
    (
        "gbysort_const_key_agg",  # groupby_sort_10.q: constant-folded
        # key (WHERE key = c GROUP BY key -> one group)
        """SELECT o_custkey, count(1) AS cnt FROM orders
           WHERE o_custkey = 370 GROUP BY o_custkey""",
    ),
    (
        "gbysort_global_count_distinct",  # groupby_sort_11.q:
        # count(DISTINCT key) with no GROUP BY
        """SELECT count(DISTINCT o_custkey) AS cd,
                  count(1) AS total FROM orders""",
    ),
    (
        "gbysort_multi_agg_one_scan",  # groupby_sort_skew_1.q shape:
        # several aggregates over the same grouped scan
        """SELECT o_custkey, count(1) AS cnt,
                  min(o_orderdate) AS first_o, max(o_orderdate) AS last_o,
                  CAST(sum(o_totalprice) AS DOUBLE) AS vol
           FROM orders GROUP BY o_custkey HAVING count(1) >= 3""",
    ),
    (
        "semijoin_right_filter_in_on",  # semijoin.q: LEFT SEMI with a
        # right-side filter inside the ON
        """SELECT n_nationkey, n_name FROM nation a
           SEMI JOIN customer b
             ON a.n_nationkey = b.c_nationkey AND b.c_acctbal < 0""",
    ),
    (
        "semijoin_right_subquery",  # semijoin.q: right side is a
        # filtered subquery
        """SELECT a.n_name FROM nation a
           SEMI JOIN (SELECT c_nationkey FROM customer
                           WHERE c_acctbal > 5000) b
             ON a.n_nationkey = b.c_nationkey""",
    ),
    (
        "semijoin_expr_key",  # semijoin.q: expression join key
        # (a.key = 2*b.key)
        """SELECT a.n_nationkey FROM nation a
           SEMI JOIN region b ON a.n_nationkey = 2 * b.r_regionkey""",
    ),
    (
        "semijoin_after_inner_join",  # semijoin.q: inner join then a
        # semijoin on the joined column
        """SELECT a.n_name, b.r_name FROM nation a
           JOIN region b ON a.n_regionkey = b.r_regionkey
           SEMI JOIN supplier c ON a.n_nationkey = c.s_nationkey""",
    ),
    (
        "semijoin_both_directions",  # semijoin.q: the ON condition
        # written right=left (b.key=a.key) must behave identically
        """SELECT a.r_regionkey FROM region a
           SEMI JOIN nation b ON b.n_regionkey = a.r_regionkey""",
    ),
    (
        "semijoin_then_groupby",  # semijoin.q + gby: aggregate above
        # a semijoin
        """SELECT a.n_regionkey, count(1) AS cnt FROM nation a
           SEMI JOIN supplier b ON a.n_nationkey = b.s_nationkey
           GROUP BY a.n_regionkey""",
    ),
    (
        "ppd2_filter_above_nested_agg",  # ppd2.q: outer filter on an
        # aggregate computed two nesting levels down (the filter can
        # NOT push below the agg; results must agree)
        """SELECT b.k, b.cc FROM (
             SELECT a.* FROM (
               SELECT l_orderkey AS k, count(l_returnflag) AS cc
               FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
               GROUP BY l_orderkey
             ) a
           ) b WHERE b.cc > 3""",
    ),
    (
        "ppd2_join_of_filtered_aggs",  # ppd2.q second statement:
        # join of two aggregated subqueries with outer filters
        """SELECT x.k, x.cc, y.cc AS cc2 FROM
             (SELECT o_custkey AS k, count(1) AS cc FROM orders
              GROUP BY o_custkey) x
           JOIN
             (SELECT c_custkey AS k, count(1) AS cc FROM customer
              GROUP BY c_custkey) y
           ON x.k = y.k WHERE x.cc > 5 AND y.cc = 1""",
    ),
    (
        "ppduv_filter_into_union_view",  # ppd_union_view.q: a view
        # over UNION ALL of (plain, joined) branches; the outer
        # partition-like filter must prune INTO both branches
        """WITH t1 AS (
             SELECT n_name AS key, n_nationkey AS value,
                    n_regionkey AS ds FROM nation
             UNION ALL
             SELECT s.s_name AS key, s.s_suppkey AS value,
                    n.n_regionkey AS ds
             FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
           )
           SELECT key, value FROM t1 WHERE ds = 2""",
    ),
    (
        "ppduv_filter_on_joined_branch_col",  # ppd_union_view.q: the
        # filter references a column computed only via the join branch
        """WITH t1 AS (
             SELECT n_name AS key, CAST(n_nationkey AS BIGINT) AS value
             FROM nation
             UNION ALL
             SELECT s.s_name AS key, CAST(s.s_acctbal AS BIGINT) AS value
             FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
             WHERE n.n_regionkey = 1
           )
           SELECT key FROM t1 WHERE value > 1000""",
    ),
    (
        "ppdvc_subquery_extra_join_filter",  # ppd_vc.q shape: join
        # against a filtered subquery with an ADDITIONAL pushdown
        # predicate in the ON over the subquery's projected column
        # (the virtual-column original is metadata-bound; the
        # pushdown-through-projection shape is what ports)
        """SELECT b.o_orderkey, b.pricebucket FROM customer a JOIN
             (SELECT o_orderkey, o_custkey,
                     CAST(FLOOR(o_totalprice / 10000) AS INT) AS pricebucket
              FROM orders WHERE o_totalprice < 200000) b
           ON a.c_custkey = b.o_custkey AND b.pricebucket < 5""",
    ),
    (
        "bmj_bucket_key_join_parity",  # bucketmapjoin1.q: join ON the
        # bucket key of both sides — result parity is the portable
        # contract (the bucket-local join plan is gated in
        # tests/test_plan_quality.py over bucketed tables)
        """SELECT count(1) AS n,
                  CAST(sum(l.l_quantity) AS DOUBLE) AS q
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""",
    ),
    (
        "bmj_one_side_filtered",  # bucketmapjoin2.q: bucket-key join
        # with a filter on one side only
        """SELECT o.o_orderstatus, count(1) AS n
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE l.l_returnflag = 'R' GROUP BY o.o_orderstatus""",
    ),
    (
        "bmj_join_key_projected",  # bucketmapjoin5.q: the join key
        # re-projected through a subquery alias
        """SELECT count(1) AS n FROM
             (SELECT l_orderkey AS k FROM lineitem WHERE l_linenumber = 1) l
           JOIN (SELECT o_orderkey AS k FROM orders) o ON l.k = o.k""",
    ),
    (
        "bso_insert_select_join_agg",  # bucketsortoptimize_insert_2.q
        # SELECT body: join of two bucket-sorted sources then agg on
        # the join key
        """SELECT l.l_orderkey, count(1) AS n,
                  CAST(sum(l.l_extendedprice) AS DOUBLE) AS rev
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderstatus <> 'P'
           GROUP BY l.l_orderkey HAVING count(1) > 4""",
    ),
    (
        "bso_union_then_join",  # bucketsortoptimize_insert_5.q shape:
        # union of two filtered scans joined against the dimension
        """SELECT o.o_orderpriority, count(1) AS n FROM (
             SELECT l_orderkey FROM lineitem WHERE l_linenumber = 1
             UNION ALL
             SELECT l_orderkey FROM lineitem WHERE l_linenumber = 2
           ) l JOIN orders o ON l.l_orderkey = o.o_orderkey
           GROUP BY o.o_orderpriority""",
    ),
    (
        "bso_join_key_subset_projection",  # bucketsortoptimize_insert_7.q:
        # only the join key and one payload column survive projection
        """SELECT l.k, o.o_orderpriority FROM
             (SELECT l_orderkey AS k FROM lineitem
              WHERE l_quantity > 49) l
           JOIN orders o ON l.k = o.o_orderkey""",
    ),
]

# ---------------------------------------------------------------- r8
# Fifty-fifth tranche: skewjoinopt_* (skew-key join result parity
# under every join type — the reference splits skewed keys into a
# separate map-join; AQE skew-join is Spark's twin and the RESULT is
# the portable contract), smb_mapjoin_4/6's outer-join chains over
# three sorted-bucket sources, auto_sortmerge_join's filtered-side
# variants, and correlationoptimizer's gby-join-gby chains (ported
# with exact integer surrogates instead of Hive's HASH(), which is
# engine-specific).
QSCRIPTS_R55 = [
    (
        "skewopt_inner_skew_key",  # skewjoinopt1.q: inner join where
        # one key value dominates (l_linenumber=1 is ~1/4 of rows)
        """SELECT a.l_linenumber, count(1) AS n
           FROM lineitem a JOIN lineitem b
             ON a.l_linenumber = b.l_linenumber AND a.l_orderkey = b.l_orderkey
           GROUP BY a.l_linenumber""",
    ),
    (
        "skewopt_filter_on_skew_col",  # skewjoinopt2.q: filter
        # restricted to the skewed values before the join
        """SELECT count(1) AS n FROM
             (SELECT o_custkey FROM orders WHERE o_custkey % 5 = 0) a
           JOIN
             (SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0) b
           ON a.o_custkey = b.c_custkey""",
    ),
    (
        "skewopt_three_way",  # skewjoinopt4.q: three-way join through
        # the same potentially-skewed key
        """SELECT n.n_regionkey, count(1) AS n
           FROM supplier s
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           JOIN customer c ON c.c_nationkey = n.n_nationkey
           GROUP BY n.n_regionkey""",
    ),
    (
        "skewopt_union_of_joins",  # skewjoinopt9.q: UNION ALL of two
        # joins over the same skewed key then re-agg
        """SELECT k, sum(n) AS total FROM (
             SELECT o_orderkey AS k, count(1) AS n FROM orders o
             JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             WHERE l.l_returnflag = 'R' GROUP BY o_orderkey
             UNION ALL
             SELECT o_orderkey AS k, count(1) AS n FROM orders o
             JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             WHERE l.l_returnflag = 'A' GROUP BY o_orderkey
           ) u GROUP BY k HAVING sum(n) > 5""",
    ),
    (
        "skewopt_double_key",  # skewjoinopt13.q: compound join key
        # (only one component skewed)
        """SELECT count(1) AS n FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey
              AND a.l_linenumber = b.l_linenumber
           WHERE a.l_returnflag = 'R'""",
    ),
    (
        "skewopt_left_outer_skew",  # skewjoinopt7.q: LEFT OUTER with
        # skewed probe side (unmatched rows must survive)
        """SELECT a.n_nationkey, count(b.s_suppkey) AS matched
           FROM nation a LEFT OUTER JOIN supplier b
             ON a.n_nationkey = b.s_nationkey AND b.s_acctbal > 9000
           GROUP BY a.n_nationkey""",
    ),
    (
        "skewopt_subquery_then_join",  # skewjoinopt14.q: skewed join
        # fed by a grouped subquery
        """SELECT a.k, a.cnt, b.o_orderpriority FROM
             (SELECT l_orderkey AS k, count(1) AS cnt FROM lineitem
              GROUP BY l_orderkey) a
           JOIN orders b ON a.k = b.o_orderkey WHERE a.cnt >= 6""",
    ),
    (
        "smb_full_outer_chain",  # smb_mapjoin_6.q: full outer join
        # then full outer join over three sources
        """SELECT a.r_regionkey AS k1, b.n_nationkey AS k2,
                  c.s_suppkey AS k3
           FROM region a
           FULL OUTER JOIN nation b ON a.r_regionkey = b.n_nationkey
           FULL OUTER JOIN supplier c ON b.n_nationkey = c.s_suppkey""",
    ),
    (
        "smb_full_then_inner",  # smb_mapjoin_6.q: FULL OUTER then
        # INNER (the inner filters the padded rows)
        """SELECT a.r_regionkey, b.n_nationkey, c.n_name
           FROM region a
           FULL OUTER JOIN nation b ON a.r_regionkey = b.n_regionkey
           JOIN nation c ON b.n_nationkey = c.n_nationkey""",
    ),
    (
        "smb_left_then_right_outer",  # smb_mapjoin_6.q: LEFT OUTER
        # then RIGHT OUTER over the chain
        """SELECT a.n_nationkey, b.s_suppkey, c.c_custkey
           FROM nation a
           LEFT OUTER JOIN supplier b ON a.n_nationkey = b.s_nationkey
           RIGHT OUTER JOIN customer c ON a.n_nationkey = c.c_nationkey
           WHERE c.c_custkey < 50""",
    ),
    (
        "smb_join_with_range_filter",  # smb_mapjoin_4.q: bucket-key
        # join with a range filter above (a.key > 1000 analogue)
        """SELECT count(1) AS n FROM lineitem a JOIN orders b
           ON a.l_orderkey = b.o_orderkey WHERE a.l_orderkey > 300""",
    ),
    (
        "smb_join_project_both_stars",  # smb_mapjoin_4.q: SELECT a.*,
        # b.* through the join (column parity both sides)
        """SELECT a.*, b.* FROM region a JOIN nation b
           ON a.r_regionkey = b.n_regionkey WHERE b.n_nationkey < 5""",
    ),
    (
        "asmj_filtered_big_side",  # auto_sortmerge_join_1.q: the big
        # side pre-filtered to one "partition" before the merge join
        """SELECT count(1) AS n FROM
             (SELECT l_orderkey FROM lineitem
              WHERE l_shipdate BETWEEN DATE '1994-01-01'
                                   AND DATE '1994-12-31') a
           JOIN orders b ON a.l_orderkey = b.o_orderkey""",
    ),
    (
        "asmj_small_side_union",  # auto_sortmerge_join_13.q: small
        # side assembled by a UNION ALL
        """SELECT count(1) AS n FROM
             (SELECT r_regionkey AS k FROM region
              UNION ALL
              SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 3) a
           JOIN nation b ON a.k = b.n_regionkey""",
    ),
    (
        "asmj_count_only_no_payload",  # auto_sortmerge_join_9.q:
        # count(*) over the join, no payload columns survive
        """SELECT count(*) AS cnt FROM supplier a JOIN nation b
           ON a.s_nationkey = b.n_nationkey""",
    ),
    (
        "corropt_gby_join_gby",  # correlationoptimizer1.q: agg, join
        # back to the base, re-agg — one shared shuffle in the
        # reference's correlation optimizer; results must agree
        # (exact surrogates instead of engine-specific HASH())
        """SELECT sum(tmp.key) AS sk, sum(tmp.cnt) AS sc FROM
             (SELECT x.n_nationkey AS key, count(1) AS cnt
              FROM nation x JOIN supplier y
                ON x.n_nationkey = y.s_nationkey
              GROUP BY x.n_nationkey) tmp""",
    ),
    (
        "corropt_join_two_aggs",  # correlationoptimizer2.q: join of
        # two aggregated subqueries sharing the key
        """SELECT sum(key1) AS a1, sum(cnt1) AS a2,
                  sum(key2) AS a3, sum(cnt2) AS a4 FROM
             (SELECT a.o_custkey AS key1, a.cnt AS cnt1,
                     b.c_custkey AS key2, b.cnt AS cnt2 FROM
                (SELECT o_custkey, count(1) AS cnt FROM orders
                 GROUP BY o_custkey) a
              JOIN
                (SELECT c_custkey, count(1) AS cnt FROM customer
                 GROUP BY c_custkey) b
              ON a.o_custkey = b.c_custkey) t""",
    ),
    (
        "corropt_agg_join_raw_then_agg",  # correlationoptimizer3.q:
        # aggregated side joined to a RAW side, re-aggregated above
        """SELECT sum(tmp.key) AS sk, sum(tmp.cnt) AS sc,
                  count(DISTINCT tmp.stat) AS sv FROM
             (SELECT b.o_custkey AS key, b.cnt AS cnt,
                     d.o_orderstatus AS stat FROM
                (SELECT o_custkey, count(1) AS cnt FROM orders
                 GROUP BY o_custkey) b
              JOIN orders d ON b.o_custkey = d.o_custkey) tmp""",
    ),
    (
        "corropt_self_join_agg_reuse",  # correlationoptimizer6.q:
        # the same aggregate subquery joined twice (xx/yy)
        """SELECT xx.k, xx.cnt, yy.cnt AS cnt2 FROM
             (SELECT c_nationkey AS k, count(1) AS cnt FROM customer
              GROUP BY c_nationkey) xx
           JOIN
             (SELECT s_nationkey AS k, count(1) AS cnt FROM supplier
              GROUP BY s_nationkey) yy
           ON xx.k = yy.k WHERE xx.cnt > yy.cnt""",
    ),
    (
        "corropt_union_then_gby_join",  # correlationoptimizer11.q:
        # union feeding a groupby whose key then joins
        """SELECT u.k, u.cnt, n.n_name FROM
             (SELECT k, count(1) AS cnt FROM (
                SELECT s_nationkey AS k FROM supplier
                UNION ALL
                SELECT c_nationkey AS k FROM customer) raw
              GROUP BY k) u
           JOIN nation n ON u.k = n.n_nationkey WHERE u.cnt >= 40""",
    ),
    (
        "corropt_distinct_above_join",  # correlationoptimizer8.q:
        # DISTINCT above a join collapses duplicate pairs
        """SELECT DISTINCT a.n_regionkey, b.r_name
           FROM nation a JOIN region b ON a.n_regionkey = b.r_regionkey""",
    ),
]

# ---------------------------------------------------------------- r8
# Fifty-sixth tranche: the numbered join-chain scripts (join28/29/32/
# 35's subquery-join-payload shapes), nullgroup_* (aggregates over
# EMPTY inputs — the classic "count of nothing" family), union tail
# shapes, and input_part-style pruned-scan shapes.
QSCRIPTS_R56 = [
    (
        "join28_subq_key_then_dim",  # join28.q: subquery join feeding
        # a second join for the payload column
        """SELECT subq.key1, z.r_name FROM
             (SELECT x.n_nationkey AS key1, x.n_regionkey AS key2
              FROM nation x JOIN supplier y
                ON x.n_nationkey = y.s_nationkey) subq
           JOIN region z ON subq.key2 = z.r_regionkey""",
    ),
    (
        "join29_two_agg_subqs",  # join29.q: join of two counted
        # subqueries projecting both counts
        """SELECT subq1.k, subq1.cnt, subq2.cnt AS cnt2 FROM
             (SELECT s_nationkey AS k, count(1) AS cnt FROM supplier
              GROUP BY s_nationkey) subq1
           JOIN
             (SELECT c_nationkey AS k, count(1) AS cnt FROM customer
              GROUP BY c_nationkey) subq2
           ON subq1.k = subq2.k""",
    ),
    (
        "join32_three_way_mixed_payload",  # join32.q: x-z-y chain
        # where the middle table supplies the join key only
        """SELECT x.n_name, z.r_name, y.s_name
           FROM nation x JOIN region z ON x.n_regionkey = z.r_regionkey
           JOIN supplier y ON y.s_nationkey = x.n_nationkey
           WHERE z.r_regionkey < 3""",
    ),
    (
        "join35_union_agg_then_join",  # join35.q: UNION ALL of two
        # filtered aggs joined back to a base table
        """SELECT x.o_orderkey, x.o_orderpriority, subq1.cnt FROM
             (SELECT l_orderkey AS k, count(1) AS cnt FROM lineitem
              WHERE l_quantity < 3 GROUP BY l_orderkey
              UNION ALL
              SELECT l_orderkey AS k, count(1) AS cnt FROM lineitem
              WHERE l_quantity > 48 GROUP BY l_orderkey) subq1
           JOIN orders x ON x.o_orderkey = subq1.k""",
    ),
    (
        "nullgroup_agg_empty_all_aggs",  # nullgroup2.q: every
        # aggregate over empty input (sum/min/max -> NULL, counts 0)
        """SELECT count(1) AS c1, count(o_custkey) AS c2,
                  sum(o_custkey) AS s, min(o_orderdate) AS mn,
                  max(o_orderdate) AS mx
           FROM orders WHERE o_orderkey < 0""",
    ),
    (
        "nullgroup_gby_empty",  # nullgroup3.q: GROUP BY over empty
        # input -> ZERO groups (not one global row); counted above so
        # the harness's empty-result vacuity guard stays meaningful
        """SELECT count(1) AS groups FROM (
             SELECT o_orderstatus, count(1) AS n FROM orders
             WHERE o_orderkey < 0 GROUP BY o_orderstatus) t""",
    ),
    (
        "nullgroup_distinct_empty",  # nullgroup4.q: count(distinct)
        # over empty input
        """SELECT count(1) AS n, count(DISTINCT o_custkey) AS d
           FROM orders WHERE o_orderkey < 0""",
    ),
    (
        "nullgroup_empty_union_side",  # nullgroup5.q: UNION ALL where
        # one branch is empty
        """SELECT k FROM (
             SELECT o_orderkey AS k FROM orders WHERE o_orderkey < 0
             UNION ALL
             SELECT o_orderkey AS k FROM orders WHERE o_orderkey < 20
           ) u""",
    ),
    (
        "union22_self_union_distinct_cast",  # union22.q: UNION
        # (DISTINCT) of overlapping projections with casts
        """SELECT CAST(n_nationkey AS BIGINT) AS k, n_name FROM nation
           WHERE n_regionkey = 0
           UNION
           SELECT CAST(n_nationkey AS BIGINT) AS k, n_name FROM nation
           WHERE n_nationkey < 10""",
    ),
    (
        "union24_agg_branch_plus_raw",  # union24.q: an aggregated
        # branch unioned with a raw branch, counted above
        """SELECT count(1) AS total FROM (
             SELECT s_nationkey AS k FROM supplier
             UNION ALL
             SELECT n_nationkey AS k FROM nation GROUP BY n_nationkey
           ) u""",
    ),
    (
        "union_constants_typed",  # union27.q-ish: typed constant
        # branches unioned with a table branch
        """SELECT k FROM (
             SELECT 1 AS k
             UNION ALL SELECT 2 AS k
             UNION ALL SELECT n_nationkey AS k FROM nation
           ) u WHERE k < 4""",
    ),
    (
        "inputpart_prune_single",  # input_part1.q: single partition-
        # like equality filter (l_shipdate plays the partition column)
        """SELECT l_orderkey, l_quantity FROM lineitem
           WHERE l_shipdate = DATE '1995-06-17'""",
    ),
    (
        "inputpart_prune_or_two",  # input_part2.q: OR of two
        # partition-like values
        """SELECT count(1) AS n FROM lineitem
           WHERE l_shipdate = DATE '1995-06-17'
              OR l_shipdate = DATE '1996-01-02'""",
    ),
    (
        "inputpart_prune_nonpart_conj",  # input_part3.q: pruning
        # filter conjoined with a payload filter
        """SELECT l_orderkey FROM lineitem
           WHERE l_shipdate BETWEEN DATE '1995-06-01' AND DATE '1995-06-30'
             AND l_returnflag = 'R'""",
    ),
    (
        "input_nested_case_expr",  # input8.q/input9.q family: nested
        # CASE + arithmetic + NULL propagation in one projection
        """SELECT o_orderkey,
                  CASE WHEN o_orderstatus = 'F'
                       THEN CASE WHEN o_totalprice > 100000
                                 THEN 'big-f' ELSE 'small-f' END
                       ELSE 'open' END AS klass,
                  o_totalprice + NULL AS nullified
           FROM orders WHERE o_orderkey < 40""",
    ),
    (
        "input_cast_chain",  # input14.q family: chained casts
        # string->double->int with arithmetic (FLOOR keeps the
        # Spark-truncates / DuckDB-rounds divergence out of play)
        """SELECT o_orderkey,
                  CAST(FLOOR(CAST(CAST(o_totalprice AS STRING) AS DOUBLE) / 1000)
                       AS INT) AS kilo
           FROM orders WHERE o_orderkey < 60""",
    ),
    (
        "input_where_between_not",  # input-family: NOT BETWEEN +
        # parenthesized OR precedence
        """SELECT n_nationkey FROM nation
           WHERE n_nationkey NOT BETWEEN 5 AND 20
             AND (n_regionkey = 0 OR n_regionkey = 4)""",
    ),
    (
        "join_payload_only_from_probe",  # join2.q family: payload
        # columns taken only from the probe side
        """SELECT a.l_orderkey, a.l_quantity FROM lineitem a
           JOIN orders b ON a.l_orderkey = b.o_orderkey
           WHERE b.o_orderstatus = 'P'""",
    ),
    (
        "join_on_constant_folded_key",  # join-family: join key
        # wrapped in constant-foldable arithmetic
        """SELECT count(1) AS n FROM nation a JOIN region b
           ON a.n_regionkey + 0 = b.r_regionkey * 1""",
    ),
    (
        "join_inequality_pair",  # theta shape from join-family:
        # equality + strict inequality in one ON
        """SELECT a.n_nationkey, b.s_suppkey
           FROM nation a JOIN supplier b
             ON a.n_nationkey = b.s_nationkey
                AND a.n_regionkey < b.s_suppkey""",
    ),
    (
        "groupby_ppr_multi_distinct",  # groupby_ppr_multi_distinct.q:
        # several DISTINCT aggregates in one grouped query
        """SELECT l_returnflag,
                  count(DISTINCT l_orderkey) AS d1,
                  count(DISTINCT l_partkey) AS d2,
                  CAST(sum(l_quantity) AS DOUBLE) AS q
           FROM lineitem GROUP BY l_returnflag""",
    ),
    (
        "groupby7_two_aggs_same_source",  # groupby7.q: two different
        # group-bys over one source, unioned
        """SELECT k, n FROM (
             SELECT l_returnflag AS k, count(1) AS n FROM lineitem
             GROUP BY l_returnflag
             UNION ALL
             SELECT l_linestatus AS k, count(1) AS n FROM lineitem
             GROUP BY l_linestatus
           ) u""",
    ),
    (
        "groupby_expr_key_and_alias",  # groupby-family: expression
        # key referenced through its alias in HAVING
        """SELECT substr(o_orderpriority, 1, 1) AS pri, count(1) AS n
           FROM orders GROUP BY substr(o_orderpriority, 1, 1)
           HAVING count(1) > 100""",
    ),
    (
        "having_on_nonprojected_agg",  # having.q: HAVING references
        # an aggregate absent from the SELECT list
        """SELECT o_custkey FROM orders GROUP BY o_custkey
           HAVING max(o_totalprice) > 400000""",
    ),
    (
        "order_by_expression_not_alias",  # order-family: ORDER BY an
        # expression over a projected column (harness sorts rows, so
        # this checks EXECUTION, not order — kept for the expression
        # resolution shape)
        """SELECT n_name, n_nationkey FROM nation
           ORDER BY length(n_name), n_nationkey""",
    ),
    (
        "limit_after_join_subquery",  # join38-ish + limit: LIMIT on a
        # deterministically ordered joined subquery
        """SELECT * FROM (
             SELECT a.n_nationkey, b.r_name FROM nation a
             JOIN region b ON a.n_regionkey = b.r_regionkey
             ORDER BY a.n_nationkey LIMIT 7
           ) t""",
    ),
    (
        "scalar_subq_in_projection",  # subquery-family positive:
        # uncorrelated scalar subquery used in arithmetic
        """SELECT n_nationkey,
                  n_nationkey - (SELECT min(n_nationkey) FROM nation) AS rel
           FROM nation WHERE n_regionkey = 1""",
    ),
    (
        "in_subquery_with_agg_filter",  # subquery_in.q positive:
        # IN-subquery whose body aggregates
        """SELECT o_orderkey FROM orders
           WHERE o_custkey IN (SELECT c_custkey FROM customer
                               GROUP BY c_custkey HAVING count(1) = 1)
             AND o_orderkey < 100""",
    ),
    (
        "not_exists_anti_with_filter",  # subquery_notexists.q:
        # NOT EXISTS with a correlated filter (nations with no
        # negative-balance supplier — excludes rows at sf>=0.01,
        # non-empty at every SF)
        """SELECT n_nationkey FROM nation n
           WHERE NOT EXISTS (SELECT 1 FROM supplier s
                             WHERE s.s_nationkey = n.n_nationkey
                               AND s.s_acctbal < 0)""",
    ),
    (
        "cross_count_pairwise_regions",  # cross_product family:
        # bounded cross join counted
        """SELECT count(1) AS pairs FROM region a, region b
           WHERE a.r_regionkey < b.r_regionkey""",
    ),
    (
        "coalesce_join_null_padding",  # join-null family: COALESCE
        # over outer-join padding
        """SELECT a.n_nationkey,
                  coalesce(b.s_name, 'none') AS sname
           FROM nation a LEFT OUTER JOIN
             (SELECT * FROM supplier WHERE s_acctbal > 9990) b
           ON a.n_nationkey = b.s_nationkey""",
    ),
    (
        "case_agg_conditional_sums",  # count/case family: conditional
        # aggregation via CASE inside SUM
        """SELECT l_returnflag,
                  sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS hi,
                  sum(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS lo
           FROM lineitem GROUP BY l_returnflag""",
    ),
    (
        "distinct_star_small_table",  # distinct-family: SELECT
        # DISTINCT * over a table with duplicates impossible (identity)
        """SELECT DISTINCT * FROM region""",
    ),
    (
        "agg_filter_is_null_vs_not",  # null-handling family: IS NULL
        # partitioned counts must cover every row exactly once
        """SELECT count(1) AS total,
                  sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nulls,
                  sum(CASE WHEN o_orderdate IS NOT NULL THEN 1 ELSE 0 END)
                    AS notnulls
           FROM orders""",
    ),
    (
        "union_three_branch_mixed_agg",  # union31-ish: three branches
        # (raw, grouped, constant) with a global count
        """SELECT count(1) AS n FROM (
             SELECT r_regionkey AS k FROM region
             UNION ALL
             SELECT n_regionkey AS k FROM nation GROUP BY n_regionkey
             UNION ALL
             SELECT 99 AS k
           ) u""",
    ),
    (
        "join_then_window_rank",  # windowing-over-join family: rank
        # within join-derived partitions
        """SELECT n_name, s_name, rnk FROM (
             SELECT n.n_name, s.s_name,
                    rank() OVER (PARTITION BY n.n_name
                                 ORDER BY s.s_acctbal DESC) AS rnk
             FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
           ) t WHERE rnk <= 2""",
    ),
    (
        "interval_date_arith_portable",  # date-arith family: date +
        # INTERVAL literal arithmetic both engines fold identically
        """SELECT o_orderkey, o_orderdate,
                  o_orderdate + INTERVAL 30 DAY AS due
           FROM orders WHERE o_orderkey < 30""",
    ),
]

# ---------------------------------------------------------------- r8
# Fifty-seventh tranche: union_remove tail shapes (union -> select* ->
# sink collapse must not change results), smb_mapjoin_13's
# different-name join columns, auto_join30's pre-sorted-subquery
# joins, multi-column IN, and scattered input/window shapes still
# unported.
QSCRIPTS_R57 = [
    (
        "unionrm_star_over_two_aggs",  # union_remove_19.q: union of
        # two aggregated branches, SELECT * above, filter above that
        """SELECT * FROM (
             SELECT n_regionkey AS k, count(1) AS v FROM nation
             GROUP BY n_regionkey
             UNION ALL
             SELECT r_regionkey AS k, count(1) AS v FROM region
             GROUP BY r_regionkey
           ) u WHERE k < 3""",
    ),
    (
        "unionrm_maponly_plus_agg",  # union_remove_15.q: one
        # map-only branch + one aggregated branch
        """SELECT k, v FROM (
             SELECT n_nationkey AS k, 1 AS v FROM nation
             WHERE n_regionkey = 2
             UNION ALL
             SELECT n_regionkey AS k, count(1) AS v FROM nation
             GROUP BY n_regionkey
           ) u""",
    ),
    (
        "unionrm_double_nesting",  # union_remove_22.q: a union INSIDE
        # a unioned branch (flattening must preserve multiplicity)
        """SELECT count(1) AS n, CAST(sum(k) AS BIGINT) AS s FROM (
             SELECT r_regionkey AS k FROM region
             UNION ALL
             SELECT k FROM (
               SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 5
               UNION ALL
               SELECT n_regionkey AS k FROM nation WHERE n_nationkey < 5
             ) inner_u
           ) outer_u""",
    ),
    (
        "smb13_different_key_names",  # smb_mapjoin_13.q: merge join
        # on columns with DIFFERENT names on each side
        """SELECT count(1) AS n FROM
             (SELECT c_custkey AS a FROM customer) x
           JOIN
             (SELECT o_custkey AS b FROM orders) y
           ON x.a = y.b""",
    ),
    (
        "aj30_presorted_subquery_join",  # auto_join30.q: both join
        # inputs are pre-sorted subqueries (sort must not change the
        # join result; exact integer surrogate instead of Hive HASH)
        """SELECT CAST(sum(y.k) AS BIGINT) AS s, count(1) AS n FROM
             (SELECT n_nationkey AS k, n_regionkey FROM nation
              ORDER BY n_nationkey) x
           JOIN
             (SELECT n_nationkey AS k, n_name FROM nation
              ORDER BY n_name) y
           ON x.k = y.k""",
    ),
    (
        "multi_col_in_struct",  # multi-column IN via row constructor
        # ((a,b) IN ((1,2),(3,4)) — both engines accept the struct form)
        """SELECT n_nationkey FROM nation
           WHERE (n_regionkey, n_nationkey % 2) IN ((0, 1), (2, 0))""",
    ),
    (
        "in_expr_list_mixed_types_coerced",  # input-family: IN list
        # mixing int and decimal literals coerces consistently
        """SELECT l_orderkey, l_quantity FROM lineitem
           WHERE l_quantity IN (1, 2.0, 3) AND l_orderkey < 100""",
    ),
    (
        "window_lag_default_and_lead_null",  # windowing_navfn.q tail:
        # lag with explicit default + lead off the partition end
        """SELECT n_regionkey, n_nationkey,
                  lag(n_nationkey, 1, -1) OVER w AS prev_k,
                  lead(n_nationkey, 2) OVER w AS next2_k
           FROM nation WINDOW w AS (PARTITION BY n_regionkey
                                    ORDER BY n_nationkey)""",
    ),
    (
        "window_sum_unbounded_both",  # windowing_windowspec.q: frame
        # UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING = group total
        """SELECT n_regionkey, n_nationkey,
                  CAST(sum(n_nationkey) OVER (PARTITION BY n_regionkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS BIGINT) AS tot
           FROM nation""",
    ),
    (
        "window_count_over_filtered_join",  # windowing-over-join:
        # count window above an outer join's padded rows
        """SELECT r.r_regionkey,
                  count(n.n_nationkey) OVER (PARTITION BY r.r_name) AS cnt
           FROM region r LEFT OUTER JOIN nation n
             ON r.r_regionkey = n.n_regionkey AND n.n_nationkey > 20""",
    ),
    (
        "groupby_all_constants",  # input-family: GROUP BY over a
        # constant-only projection collapses to distinct constants
        """SELECT k, count(1) AS n FROM
             (SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'even'
                          ELSE 'odd' END AS k FROM orders) t
           GROUP BY k""",
    ),
    (
        "except_then_join",  # setop tail: EXCEPT feeding a join
        """SELECT a.k, n.n_name FROM (
             SELECT n_nationkey AS k FROM nation
             EXCEPT
             SELECT s_nationkey AS k FROM supplier
             WHERE s_acctbal < 0
           ) a JOIN nation n ON a.k = n.n_nationkey""",
    ),
    (
        "string_funcs_compound",  # udf chains: trim/upper/substr/
        # replace composed in one projection
        """SELECT n_nationkey,
                  upper(substr(n_name, 1, 3)) AS pre,
                  replace(lower(n_name), 'a', '@') AS repl,
                  trim(concat('  ', n_name, '  ')) AS trimmed
           FROM nation WHERE n_nationkey < 8""",
    ),
    (
        "arith_mixed_precedence",  # input-family: arithmetic
        # precedence + unary minus + modulo chain
        """SELECT o_orderkey,
                  -o_orderkey + 2 * (o_orderkey % 7) - 3 AS expr1,
                  CAST(FLOOR(o_totalprice) AS BIGINT) % 97 AS m97
           FROM orders WHERE o_orderkey < 25""",
    ),
    (
        "between_dates_and_like",  # input-family: BETWEEN on dates
        # conjoined with LIKE prefix/suffix patterns
        """SELECT o_orderkey FROM orders
           WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
             AND o_orderpriority LIKE '1-%'""",
    ),
]

# ---------------------------------------------------------------- r8
# Fifty-eighth tranche: input/join long-tail shapes — outer joins
# with constant payloads, join keys through functions, scalar
# subqueries in filters, HAVING over expressions, and null-ordering
# interplay with windows.
QSCRIPTS_R58 = [
    (
        "left_join_constant_payload",  # join-family: constants
        # projected through the preserved side survive NULL padding
        """SELECT r.r_regionkey, 'marker' AS tag, n.n_name
           FROM region r LEFT OUTER JOIN
             (SELECT * FROM nation WHERE n_nationkey < 3) n
           ON r.r_regionkey = n.n_regionkey""",
    ),
    (
        "join_key_through_function",  # join-family: both keys wrapped
        # in the same function (abs) — still an equi-join semantically
        """SELECT count(1) AS n FROM nation a JOIN nation b
           ON abs(a.n_nationkey - 12) = abs(b.n_nationkey - 12)""",
    ),
    (
        "filter_scalar_subquery_arith",  # subquery positive family:
        # scalar subquery inside the WHERE arithmetic (MAX, not AVG:
        # double-avg is summation-order-dependent and a borderline
        # row flipped between engines)
        """SELECT o_orderkey FROM orders
           WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.9""",
    ),
    (
        "having_expression_not_alias",  # having family: HAVING over
        # an expression of two aggregates
        """SELECT l_returnflag,
                  CAST(sum(l_extendedprice) AS DOUBLE) AS rev,
                  count(1) AS n
           FROM lineitem GROUP BY l_returnflag
           HAVING sum(l_extendedprice) / count(1) > 30000""",
    ),
    (
        "window_over_null_keys",  # null-ordering + windows: rows with
        # NULL partition keys form ONE partition
        """SELECT k, v, count(1) OVER (PARTITION BY k) AS grp_n FROM (
             SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL
                         ELSE o_orderkey % 3 END AS k,
                    o_orderkey AS v
             FROM orders WHERE o_orderkey < 30) t""",
    ),
    (
        "anti_pattern_not_in_with_nulls_safe",  # notin_null family:
        # NOT IN against a NULL-free subquery behaves as anti-join
        """SELECT n_nationkey FROM nation
           WHERE n_nationkey NOT IN (
             SELECT s_nationkey FROM supplier WHERE s_nationkey IS NOT NULL
             AND s_acctbal < 0)""",
    ),
    (
        "union_all_then_distinct_above",  # union tail: DISTINCT above
        # a UNION ALL equals UNION
        """SELECT DISTINCT k FROM (
             SELECT n_regionkey AS k FROM nation
             UNION ALL
             SELECT r_regionkey AS k FROM region
           ) u""",
    ),
    (
        "cross_join_with_agg_sides",  # cross of two single-row aggs
        """SELECT a.mx - b.mn AS spread FROM
             (SELECT max(o_totalprice) AS mx FROM orders) a
           CROSS JOIN
             (SELECT min(o_totalprice) AS mn FROM orders) b""",
    ),
    (
        "group_by_two_exprs_same_col",  # groupby family: two distinct
        # expressions over one source column as a compound key
        """SELECT o_orderkey % 5 AS k1, o_orderkey % 3 AS k2,
                  count(1) AS n
           FROM orders GROUP BY o_orderkey % 5, o_orderkey % 3""",
    ),
    (
        "string_agg_concat_ws_collect",  # listagg-ish portable shape:
        # count + min/max of strings per group (array_agg grammars
        # differ cross-engine; the min/max string fold is the
        # portable slice of groupby_complex)
        """SELECT n_regionkey, count(1) AS n,
                  min(n_name) AS first_name, max(n_name) AS last_name
           FROM nation GROUP BY n_regionkey""",
    ),
    (
        "date_trunc_month_groupby",  # date-family: month-truncated
        # grouping (date_trunc exists in both engines)
        """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                  count(1) AS n
           FROM orders WHERE o_orderdate >= DATE '1996-01-01'
           GROUP BY date_trunc('month', o_orderdate)""",
    ),
]



# Tranche 59 (round 9): the r8 verdict's named unported families —
# union_remove_* (the 25 scripts collapse to ~8 distinct QUERY shapes;
# the file-merge/subdirectory knobs they vary are Catalyst-owned
# execution details here), windowing_expressions.q /
# windowing_multipartitioning.q, join_filters.q / join_nulls.q
# remainder (ON-vs-WHERE outer filter placement, NULL and null-safe
# keys), limit_pushdown*.q (+ limit_pushdown_negative's
# unselected-order-key shape), nullgroup remainder. All 36 prototyped
# green on both engines at sf0.01 (experiments/cand_r9.py) before
# inclusion; running SUMs over doubles are folded in DECIMAL then cast
# (fold-order parity, the standing numeric policy).
QSCRIPTS_R59 = [
    # ---- union_remove_* (the 25 scripts collapse to the distinct
    # QUERY shapes below; the file-merge/subdirectory settings they
    # vary are execution details Catalyst owns here)
    (
        "ur_union_of_two_aggs",  # union_remove_1.q
        """SELECT key, cnt FROM (
             SELECT n_regionkey AS key, COUNT(*) AS cnt FROM nation GROUP BY n_regionkey
             UNION ALL
             SELECT n_regionkey AS key, COUNT(*) AS cnt FROM nation GROUP BY n_regionkey
           ) a ORDER BY key, cnt""",
    ),
    (
        "ur_agg_over_union",  # union_remove_2.q outer agg
        """SELECT key, SUM(cnt) AS total FROM (
             SELECT n_regionkey AS key, COUNT(*) AS cnt FROM nation GROUP BY n_regionkey
             UNION ALL
             SELECT r_regionkey AS key, 1 AS cnt FROM region
           ) a GROUP BY key ORDER BY key""",
    ),
    (
        "ur_union_maponly_and_agg",  # union_remove_7.q: map-only side + reduce side
        """SELECT key, val FROM (
             SELECT o_orderstatus AS key, COUNT(*) AS val FROM orders GROUP BY o_orderstatus
             UNION ALL
             SELECT o_orderstatus AS key, CAST(o_orderkey AS BIGINT) AS val FROM orders WHERE o_orderkey < 5
           ) u ORDER BY key, val""",
    ),
    (
        "ur_three_way_union_aggs",  # union_remove_4.q 3-subquery form
        """SELECT key, SUM(c) AS s FROM (
             SELECT l_returnflag AS key, COUNT(*) AS c FROM lineitem GROUP BY l_returnflag
             UNION ALL
             SELECT l_linestatus AS key, COUNT(*) AS c FROM lineitem GROUP BY l_linestatus
             UNION ALL
             SELECT 'Z' AS key, 1 AS c
           ) u GROUP BY key ORDER BY key""",
    ),
    (
        "ur_union_distinct_of_aggs",  # union_remove_10 DISTINCT variant
        """SELECT key, cnt FROM (
             SELECT n_regionkey AS key, COUNT(*) AS cnt FROM nation GROUP BY n_regionkey
             UNION
             SELECT n_regionkey AS key, COUNT(*) AS cnt FROM nation GROUP BY n_regionkey
           ) a ORDER BY key""",
    ),
    (
        "ur_union_joined_to_dim",  # union_remove_17-ish: union then join
        """SELECT r.r_name, u.cnt FROM (
             SELECT n_regionkey AS key, COUNT(*) AS cnt FROM nation GROUP BY n_regionkey
             UNION ALL
             SELECT n_regionkey AS key, SUM(n_nationkey) AS cnt FROM nation GROUP BY n_regionkey
           ) u JOIN region r ON u.key = r.r_regionkey
           ORDER BY r.r_name, u.cnt""",
    ),
    (
        "ur_count_star_over_union",
        """SELECT COUNT(*) AS n FROM (
             SELECT n_nationkey FROM nation WHERE n_regionkey = 0
             UNION ALL
             SELECT s_suppkey FROM supplier WHERE s_nationkey < 5
           ) u""",
    ),
    (
        "ur_union_in_in_subquery",
        """SELECT c_mktsegment, COUNT(*) AS n FROM customer
           WHERE c_nationkey IN (
             SELECT n_nationkey FROM nation WHERE n_regionkey = 1
             UNION ALL
             SELECT n_nationkey FROM nation WHERE n_regionkey = 2
           )
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    ),
    # ---- windowing_expressions.q shapes
    (
        "we_lag_numeric_default",
        """SELECT l_orderkey, l_linenumber,
                  l_quantity - lag(l_quantity, 3, 0) OVER
                    (PARTITION BY l_orderkey ORDER BY l_linenumber) AS d3
           FROM lineitem WHERE l_orderkey < 40
           ORDER BY l_orderkey, l_linenumber""",
    ),
    (
        "we_lead_numeric_default",
        """SELECT l_orderkey, l_linenumber,
                  l_quantity - lead(l_quantity, 2, 0) OVER
                    (PARTITION BY l_orderkey ORDER BY l_linenumber) AS dl
           FROM lineitem WHERE l_orderkey < 40
           ORDER BY l_orderkey, l_linenumber""",
    ),
    (
        "we_lag_string_default",  # lag(s, 3, 'fred')
        """SELECT n_nationkey,
                  lag(n_name, 3, 'fred') OVER (ORDER BY n_nationkey) AS lagged
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "we_window_clause_reuse",  # WINDOW w AS ... used twice
        """SELECT p_brand, p_partkey,
                  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running,
                  MAX(p_size) OVER w AS mx
           FROM part
           WINDOW w AS (PARTITION BY p_brand ORDER BY p_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ORDER BY p_brand, p_partkey""",
    ),
    (
        "we_minmax_span_equals_firstlast",  # the identity row from windowing_expressions.q
        """SELECT p_brand, p_partkey,
                  MAX(p_size) OVER w - MIN(p_size) OVER w AS span,
                  first_value(p_size) OVER w AS fv,
                  last_value(p_size) OVER w AS lv
           FROM part
           WINDOW w AS (PARTITION BY p_brand ORDER BY p_size
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ORDER BY p_brand, p_partkey""",
    ),
    (
        "we_sliding_frame_1_1",
        """SELECT l_orderkey, l_linenumber,
                  CAST(SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                       ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS s3
           FROM lineitem WHERE l_orderkey < 60
           ORDER BY l_orderkey, l_linenumber""",
    ),
    (
        "we_nth_value",
        """SELECT p_brand, p_partkey,
                  nth_value(p_partkey, 2) OVER (PARTITION BY p_brand ORDER BY p_partkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
           FROM part ORDER BY p_brand, p_partkey""",
    ),
    (
        "we_range_numeric_frame",
        """SELECT p_brand, p_size,
                  COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                     RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS near
           FROM part ORDER BY p_brand, p_size, near""",
    ),
    # ---- windowing_multipartitioning.q: different specs in one select
    (
        "wm_two_partition_specs",
        """SELECT s_suppkey,
                  rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) AS r_nat,
                  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER (ORDER BY s_suppkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_all
           FROM supplier ORDER BY s_suppkey""",
    ),
    (
        "wm_three_partition_specs",
        """SELECT o_orderkey,
                  row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn_status,
                  rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rk_prio,
                  COUNT(*) OVER (PARTITION BY o_custkey) AS per_cust
           FROM orders WHERE o_orderkey < 200
           ORDER BY o_orderkey""",
    ),
    # ---- join_filters / join_nulls remainder
    (
        "jf_left_filter_in_on",
        """SELECT n.n_name, s.s_name
           FROM nation n LEFT JOIN supplier s
             ON n.n_nationkey = s.s_nationkey AND s.s_acctbal > 5000
           ORDER BY n.n_name, s.s_name""",
    ),
    (
        "jf_left_filter_in_where",  # same predicate in WHERE = inner
        """SELECT n.n_name, s.s_name
           FROM nation n LEFT JOIN supplier s
             ON n.n_nationkey = s.s_nationkey
           WHERE s.s_acctbal > 5000
           ORDER BY n.n_name, s.s_name""",
    ),
    (
        "jf_full_outer_on_filters",
        """SELECT n.n_name, r.r_name
           FROM nation n FULL OUTER JOIN region r
             ON n.n_regionkey = r.r_regionkey AND n.n_nationkey > 10 AND r.r_regionkey < 3
           ORDER BY n.n_name NULLS FIRST, r.r_name NULLS FIRST""",
    ),
    (
        "jf_right_filter_on_left_side",
        """SELECT n.n_name, s.s_name
           FROM supplier s RIGHT JOIN nation n
             ON n.n_nationkey = s.s_nationkey AND s.s_suppkey % 2 = 0
           ORDER BY n.n_name, s.s_name""",
    ),
    (
        "jn_nullable_key_inner_drops_nulls",
        """SELECT COUNT(*) AS n
           FROM (SELECT nullif(n_regionkey, 2) AS k FROM nation) a
           JOIN (SELECT nullif(r_regionkey, 2) AS k FROM region) b
             ON a.k = b.k""",
    ),
    (
        "jn_null_safe_join",  # <=> spelled portably
        """SELECT COUNT(*) AS n
           FROM (SELECT nullif(n_regionkey, 2) AS k FROM nation) a
           JOIN (SELECT nullif(r_regionkey, 2) AS k FROM region) b
             ON a.k IS NOT DISTINCT FROM b.k""",
    ),
    (
        "jn_coalesced_join_key",
        """SELECT COALESCE(a.k, -1) AS k, COUNT(*) AS n
           FROM (SELECT nullif(n_regionkey, 0) AS k FROM nation) a
           LEFT JOIN region b ON a.k = b.r_regionkey
           GROUP BY COALESCE(a.k, -1) ORDER BY k""",
    ),
    (
        "jf_or_condition_outer",
        """SELECT n.n_name, r.r_name
           FROM nation n LEFT JOIN region r
             ON n.n_regionkey = r.r_regionkey AND (r.r_name LIKE 'A%' OR r.r_name LIKE 'E%')
           ORDER BY n.n_name, r.r_name NULLS FIRST""",
    ),
    # ---- limit_pushdown* shapes
    (
        "lp_limit_over_group_by",
        """SELECT l_partkey, CAST(SUM(l_quantity) AS DOUBLE) AS q
           FROM lineitem GROUP BY l_partkey
           ORDER BY q DESC, l_partkey LIMIT 7""",
    ),
    (
        "lp_limit_distinct",
        """SELECT DISTINCT o_orderpriority FROM orders
           ORDER BY o_orderpriority LIMIT 3""",
    ),
    (
        "lp_limit_over_union",
        """SELECT k FROM (
             SELECT n_nationkey AS k FROM nation
             UNION ALL
             SELECT r_regionkey AS k FROM region
           ) u ORDER BY k DESC LIMIT 6""",
    ),
    (
        "lp_limit_offset",
        """SELECT n_nationkey, n_name FROM nation
           ORDER BY n_nationkey LIMIT 5 OFFSET 10""",
    ),
    (
        "lp_order_by_unselected_then_limit",  # limit_pushdown_negative theme
        """SELECT o_orderkey FROM orders
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 9""",
    ),
    (
        "lp_limit_after_window",
        """SELECT * FROM (
             SELECT c_custkey, c_acctbal,
                    row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn
             FROM customer
           ) t WHERE rn <= 5 ORDER BY rn""",
    ),
    # ---- nullgroup / groupby remainder
    (
        "ng_count_on_empty_input",  # nullgroup.q: aggs over zero rows
        """SELECT COUNT(*) AS n, COUNT(n_name) AS nn,
                  CAST(COALESCE(SUM(n_nationkey), 0) AS BIGINT) AS s
           FROM nation WHERE n_nationkey < 0""",
    ),
    (
        "gb_expression_keys",
        """SELECT length(n_name) AS len, COUNT(*) AS n
           FROM nation GROUP BY length(n_name) ORDER BY len""",
    ),
    (
        "gb_having_on_agg_expr",
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           GROUP BY l_returnflag
           HAVING COUNT(*) > 100 AND MIN(l_quantity) >= 1
           ORDER BY l_returnflag""",
    ),
    (
        "gb_distinct_inside_count_over_union",
        """SELECT COUNT(DISTINCT k) AS n FROM (
             SELECT n_regionkey AS k FROM nation
             UNION ALL
             SELECT r_regionkey AS k FROM region
           ) u""",
    ),
]




# Tranche 60 (round 9): set-operation tail (EXCEPT forms, mixed
# chains), subquery long tail (exists/not-exists in HAVING, scalar
# subqueries in the select list, correlated-aggregate comparison),
# portable udf_* string/date/math shapes (instr/locate, translate,
# lpad/rpad, split_part, levenshtein, ascii/chr, trim variants,
# date_trunc/extract/last_day/interval arithmetic, decimal precision
# chains, greatest/least, factorial/cbrt), ORDER BY null-placement,
# GROUPING SETS edges (explicit sets, expression keys, grouping()),
# count variants (FILTER clause, conditional, distinct-pair via
# concat), having-on-unselected-agg, cbo semi/anti/exists mixes. All
# 42 prototyped green on both engines (experiments/cand_r9b.py).
# Drops, documented: quantified comparison `> ALL (subquery)` is a
# PARSE error in Spark (no quantified comparisons — DuckDB has them);
# DuckDB lacks add_months/width_bucket/datediff(end,start)/
# multi-arg COUNT(DISTINCT a,b) so those shapes are respelled
# portably or replaced; thresholds are distribution-relative so the
# per-round testdata regeneration cannot make a branch vacuous.
QSCRIPTS_R60 = [
    # ---- set operations (intersect.q / except_all.q / setop tails)
    (
        "setop_except_distinct",
        """SELECT o_orderpriority FROM orders
           EXCEPT
           SELECT '1-URGENT' AS o_orderpriority
           ORDER BY o_orderpriority""",
    ),
    (
        "setop_chain_mixed",
        """SELECT k FROM (
             SELECT n_regionkey AS k FROM nation
             INTERSECT
             SELECT r_regionkey AS k FROM region
           ) a
           UNION ALL
           SELECT 99 AS k
           ORDER BY k""",
    ),
    # ---- subquery long tail
    (
        "subq_exists_having",  # subquery_exists_having.q
        """SELECT c_nationkey, COUNT(*) AS n
           FROM customer c GROUP BY c_nationkey
           HAVING EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey
                            AND n.n_regionkey = 2)
           ORDER BY c_nationkey""",
    ),
    (
        "subq_not_exists_having",  # subquery_notexists_having.q
        """SELECT s_nationkey, COUNT(*) AS n
           FROM supplier s GROUP BY s_nationkey
           HAVING NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey
                                AND n.n_regionkey IN (0, 1))
           ORDER BY s_nationkey""",
    ),
    (
        "subq_scalar_in_select",  # subquery_scalar.q select-list form
        """SELECT n_name,
                  (SELECT r_name FROM region r
                   WHERE r.r_regionkey = n.n_regionkey) AS region_name
           FROM nation n ORDER BY n_name""",
    ),
    (
        "subq_scalar_agg_in_select",
        """SELECT o_orderpriority,
                  COUNT(*) AS n,
                  (SELECT COUNT(*) FROM orders) AS total
           FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    ),
    (
        "subq_correlated_agg_compare",  # subquery_in.q agg-correlated form
        """SELECT p_brand, p_partkey FROM part p
           WHERE p_retailprice > (SELECT AVG(p2.p_retailprice) * 1.02
                                  FROM part p2
                                  WHERE p2.p_brand = p.p_brand)
           ORDER BY p_brand, p_partkey""",
    ),
    (
        "subq_in_from_derived_chain",  # nested derived tables, 3 deep
        """SELECT k, n FROM (
             SELECT k, COUNT(*) AS n FROM (
               SELECT n_regionkey AS k FROM nation WHERE n_nationkey <> 3
             ) a GROUP BY k
           ) b WHERE n > 3 ORDER BY k""",
    ),
    # ---- string udf_* portable shapes
    (
        "str_instr_locate_family",  # udf_instr.q / udf_locate.q
        """SELECT n_name,
                  instr(n_name, 'AN') AS pos_an,
                  position('A' IN n_name) AS pos_a
           FROM nation ORDER BY n_name""",
    ),
    (
        "str_translate_replace",  # udf_translate.q
        """SELECT n_name,
                  translate(n_name, 'AEIOU', 'aeiou') AS tr,
                  replace(n_name, 'IA', '**') AS rep
           FROM nation ORDER BY n_name""",
    ),
    (
        "str_lpad_rpad_repeat",
        """SELECT n_nationkey,
                  lpad(n_name, 12, '.') AS lp,
                  rpad(n_name, 12, '.') AS rp,
                  repeat('ab', CAST(n_regionkey AS INT)) AS rep
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "str_split_part_family",
        """SELECT p_partkey, p_type,
                  split_part(p_type, ' ', 1) AS w1,
                  split_part(p_type, ' ', 2) AS w2
           FROM part WHERE p_partkey < 60 ORDER BY p_partkey""",
    ),
    (
        "str_levenshtein",  # udf_levenshtein.q
        """SELECT r_name, levenshtein(r_name, 'AMERICA') AS d
           FROM region ORDER BY r_name""",
    ),
    (
        "str_ascii_chr_shift",  # udf_ascii.q / udf_chr: +1 code-point
        # shift (differentiated r11 — was a literal dup of
        # chr_ascii_roundtrip)
        """SELECT n_nationkey, chr(ascii(n_name) + 1) AS shifted
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "str_trim_variants",
        """SELECT r_name,
                  trim(BOTH 'A' FROM r_name) AS both_a,
                  ltrim('  ' || r_name) AS lt,
                  rtrim(r_name || '  ') AS rt
           FROM region ORDER BY r_name""",
    ),
    (
        "str_concat_ws_upperlower",
        """SELECT n_nationkey,
                  concat_ws('-', lower(n_name), upper(n_name)) AS both_cases
           FROM nation ORDER BY n_nationkey""",
    ),
    # ---- date/time udf shapes over real date columns
    (
        "date_trunc_quarter_month",
        """SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q,
                  CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                  COUNT(*) AS n
           FROM orders GROUP BY 1, 2 ORDER BY q, m""",
    ),
    (
        "date_interval_add",
        """SELECT l_orderkey, l_linenumber,
                  CAST(CAST(l_shipdate AS DATE) + INTERVAL 30 DAY AS DATE) AS eta,
                  CAST(l_shipdate + INTERVAL 2 HOUR AS TIMESTAMP) AS ship_plus2h
           FROM lineitem WHERE l_orderkey < 40
           ORDER BY l_orderkey, l_linenumber""",
    ),
    (
        "date_parts_extract",
        """SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
                  EXTRACT(MONTH FROM o_orderdate) AS m,
                  EXTRACT(DAY FROM o_orderdate) AS d,
                  COUNT(*) AS n
           FROM orders GROUP BY 1, 2, 3 ORDER BY y, m, d""",
    ),
    (
        "date_last_day_eom",
        """SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                  CAST(last_day(o_orderdate) AS DATE) AS eom
           FROM orders ORDER BY m""",
    ),
    (
        "date_between_range",
        """SELECT COUNT(*) AS n,
                  MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi
           FROM lineitem
           WHERE l_shipdate BETWEEN DATE '1994-03-01' AND DATE '1994-06-30'""",
    ),
    # ---- decimal arithmetic precision (decimal_precision.q family)
    (
        "dec_div_precision",
        """SELECT l_linenumber,
                  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                       / CAST(COUNT(*) AS DECIMAL(18,0)) AS DECIMAL(18,6)) AS avg_price
           FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""",
    ),
    (
        "dec_mul_round_floor_ceil",
        """SELECT p_partkey,
                  ROUND(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(1.0750 AS DECIMAL(6,4)), 2) AS taxed,
                  CAST(FLOOR(p_retailprice) AS BIGINT) AS fl, CAST(CEIL(p_retailprice) AS BIGINT) AS ce
           FROM part WHERE p_partkey < 50 ORDER BY p_partkey""",
    ),
    (
        "dec_mod_abs_sign",
        """SELECT l_linenumber,
                  CAST(MOD(CAST(SUM(CAST(l_quantity AS DECIMAL(12,0))) AS BIGINT), 7) AS BIGINT) AS m7,
                  ABS(-l_linenumber) AS ab, CAST(SIGN(l_linenumber - 4) AS INT) AS sg
           FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""",
    ),
    # ---- ORDER BY null placement (order_null.q)
    (
        "ord_nulls_first_last_mix",
        """SELECT k, v FROM (
             SELECT nullif(n_regionkey, 2) AS k, n_name AS v FROM nation
           ) t ORDER BY k ASC NULLS FIRST, v DESC""",
    ),
    (
        "ord_desc_nulls_last",
        """SELECT k, v FROM (
             SELECT nullif(n_regionkey, 0) AS k, n_nationkey AS v FROM nation
           ) t ORDER BY k DESC NULLS LAST, v""",
    ),
    # ---- grouping sets edges (groupby_grouping_sets*.q beyond rollup)
    (
        "gsets_explicit_sets",
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
           ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n""",
    ),
    (
        "gsets_with_expression_key",
        """SELECT length(o_orderpriority) AS len, o_orderstatus, COUNT(*) AS n
           FROM orders
           GROUP BY GROUPING SETS ((length(o_orderpriority)), (o_orderstatus))
           ORDER BY len NULLS FIRST, o_orderstatus NULLS FIRST""",
    ),
    (
        "gsets_grouping_function",
        """SELECT o_orderstatus, o_orderpriority,
                  grouping(o_orderstatus) AS g_s, grouping(o_orderpriority) AS g_p,
                  COUNT(*) AS n
           FROM orders
           GROUP BY CUBE (o_orderstatus, o_orderpriority)
           ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    ),
    # ---- count.q variants
    (
        "cnt_distinct_pairs",
        """SELECT COUNT(DISTINCT l_returnflag || '|' || l_linestatus) AS pairs
           FROM lineitem""",
    ),
    (
        "cnt_conditional_null_skip",
        """SELECT o_orderstatus,
                  COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS big,
                  COUNT(*) AS total
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "cnt_filter_clause",
        """SELECT l_returnflag,
                  COUNT(*) FILTER (WHERE l_discount > 0.05) AS discounted,
                  COUNT(*) AS n
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ),
    # ---- having / cbo shapes
    (
        "having_on_nonselected_agg",  # having2.q
        """SELECT c_nationkey FROM customer
           GROUP BY c_nationkey
           HAVING CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) > 20000
           ORDER BY c_nationkey""",
    ),
    (
        "cbo_semi_then_agg",  # cbo_semijoin.q composition
        """SELECT n_regionkey, COUNT(*) AS n
           FROM nation WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)
           GROUP BY n_regionkey ORDER BY n_regionkey""",
    ),
    (
        "cbo_exists_join_mix",
        """SELECT c.c_mktsegment, COUNT(*) AS n
           FROM customer c JOIN nation nt ON c.c_nationkey = nt.n_nationkey
           WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 250000)
           GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",
    ),
    (
        "cbo_anti_via_not_exists_join",
        """SELECT nt.n_name, COUNT(*) AS suppliers_without_big_balance
           FROM supplier s JOIN nation nt ON s.s_nationkey = nt.n_nationkey
           WHERE NOT EXISTS (SELECT 1 FROM customer c JOIN orders o
                               ON o.o_custkey = c.c_custkey
                             WHERE c.c_nationkey = s.s_nationkey
                               AND o.o_totalprice > (SELECT MAX(o2.o_totalprice) * 0.994 FROM orders o2))
           GROUP BY nt.n_name ORDER BY nt.n_name""",
    ),
    # ---- case expression shapes (udf_case.q / udf_when.q)
    (
        "case_nested_searched",
        """SELECT o_orderkey,
                  CASE WHEN o_totalprice > 300000 THEN 'huge'
                       WHEN o_totalprice > 150000 THEN
                         CASE o_orderstatus WHEN 'F' THEN 'big-final' ELSE 'big-open' END
                       ELSE 'small' END AS bucket
           FROM orders WHERE o_orderkey < 120 ORDER BY o_orderkey""",
    ),
    (
        "case_simple_form_with_null",
        """SELECT n_regionkey,
                  CASE n_regionkey WHEN 0 THEN 'zero' WHEN NULL THEN 'never' ELSE 'other' END AS simple,
                  COUNT(*) AS n
           FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    ),
    # ---- math udf shapes
    (
        "math_log_exp_sqrt_pow",
        """SELECT p_partkey,
                  ROUND(ln(p_retailprice), 6) AS lnp,
                  ROUND(log10(p_retailprice), 6) AS l10,
                  ROUND(sqrt(p_size), 6) AS sq,
                  CAST(power(p_size, 2) AS DOUBLE) AS p2
           FROM part WHERE p_partkey < 40 ORDER BY p_partkey""",
    ),
    (
        "math_trig_rounded",
        """SELECT n_nationkey,
                  ROUND(sin(n_nationkey), 10) AS s,
                  ROUND(cos(n_nationkey), 10) AS c,
                  ROUND(atan(n_nationkey), 10) AS a
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "math_greatest_least",
        """SELECT l_orderkey, l_linenumber,
                  greatest(l_quantity, l_discount * 100, l_linenumber) AS g,
                  least(l_quantity, l_tax * 100, 10.0) AS l
           FROM lineitem WHERE l_orderkey < 30
           ORDER BY l_orderkey, l_linenumber""",
    ),
    (
        "math_factorial_cbrt",
        """SELECT n_nationkey,
                  factorial(CAST(n_regionkey AS INT)) AS f,
                  ROUND(cbrt(n_nationkey), 8) AS cb
           FROM nation ORDER BY n_nationkey""",
    ),
]




# Tranche 61 (round 9): ppd_outer_join*/ppd_union/join_cond_pushdown
# predicate-placement shapes (including the nonpushable IS NULL probe
# with a distribution-relative threshold so testdata regeneration
# cannot vacuate it), multi-way star/self/cross join chains, regexp
# and LIKE-with-ESCAPE patterns over the real fixture vocabulary,
# events-table time analytics (hour histogram, first/last per user,
# lag transitions), statistical aggregates, bitwise AND/OR (xor
# dropped: DuckDB's ^ means POWER), type-coercion unions,
# documents-table CASE matrices, rank/ntile/percent_rank over joins.
# All 38 prototyped green on both engines (experiments/cand_r9c.py).
QSCRIPTS_R61 = [
    # ---- ppd_* remainder: predicate placement around outer joins
    (
        "ppd_outer_join_pushable_left",  # ppd_outer_join1.q
        """SELECT n.n_name, s.s_name
           FROM nation n LEFT JOIN supplier s ON n.n_nationkey = s.s_nationkey
           WHERE n.n_regionkey = 1
           ORDER BY n.n_name, s.s_name NULLS FIRST""",
    ),
    (
        "ppd_outer_join_nonpushable_right",  # ppd_outer_join2.q: IS NULL probe
        """SELECT n.n_name
           FROM nation n LEFT JOIN (
             SELECT * FROM supplier
             WHERE s_acctbal > (SELECT MAX(s2.s_acctbal) * 0.9 FROM supplier s2)
           ) s ON n.n_nationkey = s.s_nationkey
           WHERE s.s_suppkey IS NULL
           ORDER BY n.n_name""",
    ),
    (
        "ppd_through_derived_and_union",  # ppd_union.q over a derived union
        """SELECT key, cnt FROM (
             SELECT n_regionkey AS key, COUNT(*) AS cnt FROM nation GROUP BY n_regionkey
             UNION ALL
             SELECT r_regionkey AS key, 10 AS cnt FROM region
           ) u WHERE key >= 2 ORDER BY key, cnt""",
    ),
    (
        "ppd_constant_fold_filter",  # constant folding + residual
        """SELECT o_orderkey, o_totalprice FROM orders
           WHERE 1 = 1 AND o_orderkey < 50 AND 2 > 1
           ORDER BY o_orderkey""",
    ),
    (
        "ppd_join_cond_expression",  # join_cond_pushdown_*.q: expr in ON
        """SELECT n.n_name, r.r_name
           FROM nation n JOIN region r
             ON n.n_regionkey + 1 = r.r_regionkey + 1 AND upper(r.r_name) = r.r_name
           ORDER BY n.n_name""",
    ),
    # ---- multi-way join chains
    (
        "join_star_two_dims",
        """SELECT n.n_name, p.p_brand, COUNT(*) AS n
           FROM lineitem l
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           JOIN part p ON l.l_partkey = p.p_partkey
           WHERE p.p_size < 5
           GROUP BY n.n_name, p.p_brand
           ORDER BY n.n_name, p.p_brand""",
    ),
    (
        "join_self_pairs_same_table",  # self-join distinct pairs
        """SELECT a.n_name AS n1, b.n_name AS n2
           FROM nation a JOIN nation b
             ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
           WHERE a.n_regionkey = 0
           ORDER BY n1, n2""",
    ),
    (
        "join_cross_small_dims",  # cross_product_check lineage
        """SELECT r1.r_name AS a, r2.r_name AS b
           FROM region r1 CROSS JOIN region r2
           WHERE r1.r_regionkey < r2.r_regionkey
           ORDER BY a, b""",
    ),
    (
        "join_mixed_inner_left_right",
        """SELECT n.n_name, r.r_name, COUNT(s.s_suppkey) AS n_supp
           FROM nation n
           JOIN region r ON n.n_regionkey = r.r_regionkey
           LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey AND s.s_acctbal > 9000
           GROUP BY n.n_name, r.r_name
           ORDER BY n.n_name""",
    ),
    # ---- regexp / LIKE patterns (udf_regexp*.q, like escapes)
    (
        "re_extract_groups",
        """SELECT p_partkey,
                  regexp_extract(p_type, '^(\\\\w+) (\\\\w+)', 1) AS w1,
                  regexp_extract(p_type, '^(\\\\w+) (\\\\w+)', 2) AS w2
           FROM part WHERE p_partkey < 40 ORDER BY p_partkey""",
    ),
    (
        "re_replace_digits",
        """SELECT o_orderkey,
                  regexp_replace(o_orderpriority, '[0-9]', '#') AS masked
           FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey""",
    ),
    (
        "like_multi_patterns",
        """SELECT p_partkey, p_name FROM part
           WHERE p_name LIKE '%widget%' OR p_name LIKE 'sma%'
           ORDER BY p_partkey""",
    ),
    (
        "like_underscore_and_not",
        """SELECT r_name FROM region
           WHERE r_name LIKE 'A_____A' AND r_name NOT LIKE '%Z%'
           ORDER BY r_name""",
    ),
    (
        "like_escape_literal_percent",
        """SELECT COUNT(*) AS n FROM (
             SELECT '10% off' AS s UNION ALL SELECT '20x off' UNION ALL SELECT '5% off'
           ) t WHERE s LIKE '%!%%' ESCAPE '!'""",
    ),
    # ---- events-table time analytics
    (
        "ev_hourly_activity",
        """SELECT EXTRACT(HOUR FROM ts) AS h, COUNT(*) AS n
           FROM events GROUP BY 1 ORDER BY h""",
    ),
    (
        "ev_type_share_per_user_band",
        """SELECT event_type,
                  COUNT(*) AS n,
                  COUNT(DISTINCT user_id) AS users
           FROM events GROUP BY event_type ORDER BY event_type""",
    ),
    (
        "ev_first_last_per_user",
        """SELECT user_id, MIN(ts) AS first_seen, MAX(ts) AS last_seen,
                  COUNT(*) AS n
           FROM events GROUP BY user_id
           ORDER BY user_id LIMIT 40""",
    ),
    (
        "ev_value_stats_by_type",
        """SELECT event_type,
                  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
                  MAX(value) AS mx, MIN(value) AS mn
           FROM events GROUP BY event_type ORDER BY event_type""",
    ),
    (
        "ev_prev_event_transition",
        """SELECT user_id, event_id, event_type,
                  lag(event_type, 1, 'START') OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
           FROM events WHERE user_id <= 3
           ORDER BY user_id, event_id""",
    ),
    # ---- statistical aggregates (udaf_* parity shapes)
    (
        "stat_stddev_var_rounded",
        """SELECT l_linenumber,
                  ROUND(stddev_samp(l_quantity), 6) AS sd,
                  ROUND(var_pop(l_quantity), 6) AS vp
           FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""",
    ),
    (
        "stat_corr_covar_rounded",
        """SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS c,
                  ROUND(covar_samp(l_quantity, l_discount), 6) AS cs
           FROM lineitem""",
    ),
    (
        "stat_min_max_strings_dates",
        """SELECT o_orderstatus,
                  MIN(o_orderpriority) AS min_prio, MAX(o_orderpriority) AS max_prio,
                  MIN(o_orderdate) AS first_dt, MAX(o_orderdate) AS last_dt
           FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "stat_avg_distinct",
        """SELECT l_returnflag,
                  CAST(AVG(DISTINCT l_linenumber) AS DOUBLE) AS avg_distinct_ln
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ),
    # ---- bit operations (udf_bitwise_and/or.q; xor dropped: DuckDB
    # spells it xor() while ^ means POWER there — not portable text)
    (
        "bit_and_or_masks",
        """SELECT n_nationkey,
                  n_nationkey & 5 AS band, n_nationkey | 8 AS bor
           FROM nation ORDER BY n_nationkey""",
    ),
    # ---- coercion / conditional
    (
        "coerce_union_int_bigint_double",
        """SELECT k, COUNT(*) AS n FROM (
             SELECT CAST(n_regionkey AS INT) AS k FROM nation
             UNION ALL
             SELECT CAST(r_regionkey AS BIGINT) AS k FROM region
             UNION ALL
             SELECT CAST(0.5 AS DOUBLE) AS k
           ) u GROUP BY k ORDER BY k""",
    ),
    (
        "cond_ifnull_nullif_coalesce",
        """SELECT n_nationkey,
                  ifnull(nullif(n_regionkey, 2), -1) AS masked,
                  coalesce(nullif(n_name, 'CANADA'), 'was-canada') AS name2
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "cond_mod_negative_dividend",
        """SELECT (0 - n_nationkey) % 3 AS m, COUNT(*) AS n
           FROM nation GROUP BY 1 ORDER BY m""",
    ),
    (
        "cond_between_symmetric_edges",
        """SELECT COUNT(*) AS in_range,
                  SUM(CASE WHEN p_size BETWEEN 10 AND 20 THEN 1 ELSE 0 END) AS case_sum
           FROM part WHERE p_size BETWEEN 10 AND 20""",
    ),
    # ---- order/limit composition over joins
    (
        "topn_join_then_order",
        """SELECT c.c_name, o.o_totalprice
           FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
           ORDER BY o.o_totalprice DESC, c.c_name LIMIT 8""",
    ),
    (
        "distinct_on_join_result",
        """SELECT DISTINCT n.n_regionkey, s.s_nationkey
           FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
           ORDER BY n.n_regionkey, s.s_nationkey""",
    ),
    # ---- documents-table text shapes
    (
        "doc_length_band_by_lang",
        """SELECT lang,
                  SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS short_docs,
                  SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS long_docs
           FROM documents GROUP BY lang ORDER BY lang""",
    ),
    (
        "doc_source_lang_matrix",
        """SELECT source,
                  COUNT(CASE WHEN lang = 'en' THEN 1 END) AS en,
                  COUNT(CASE WHEN lang <> 'en' THEN 1 END) AS other
           FROM documents GROUP BY source ORDER BY source""",
    ),
    (
        "doc_prefix_grouping",
        """SELECT substr(CAST(doc_id AS STRING), 1, 2) AS prefix, COUNT(*) AS n
           FROM documents GROUP BY 1 ORDER BY prefix LIMIT 20""",
    ),
    # ---- window over join (windowing_gby lineage)
    (
        "win_rank_over_join_agg",
        """SELECT n_name, total,
                  rank() OVER (ORDER BY total DESC, n_name) AS rnk
           FROM (
             SELECT n.n_name, CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
             FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
             GROUP BY n.n_name
           ) t ORDER BY rnk, n_name""",
    ),
    (
        "win_percent_rank_cume_dist",
        """SELECT s_suppkey,
                  ROUND(percent_rank() OVER (ORDER BY s_acctbal), 8) AS pr,
                  ROUND(cume_dist() OVER (ORDER BY s_acctbal), 8) AS cd
           FROM supplier ORDER BY s_suppkey""",
    ),
    (
        "win_ntile_quartiles",
        """SELECT c_custkey, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
           FROM customer WHERE c_custkey <= 200
           ORDER BY c_custkey""",
    ),
    (
        "str_hex_md5_digest",
        """SELECT r_regionkey, hex(r_regionkey) AS h, md5(r_name) AS digest
           FROM region ORDER BY r_regionkey""",
    ),
    (
        "win_first_order_per_cust_band",
        """SELECT o_custkey, MIN(o_orderdate) AS first_order,
                  COUNT(*) AS orders
           FROM orders GROUP BY o_custkey
           HAVING COUNT(*) >= 12
           ORDER BY o_custkey""",
    ),
]




# Tranche 62 (round 9, batch 4): groupby positional/alias edges,
# CTE compositions (3-level chains, reuse-in-self-join, inner
# shadowing), ORDER BY expressions/CASE keys, IN/BETWEEN boundaries,
# correlated subqueries in CASE and the select list, window frame
# boundary shapes (CURRENT..UNBOUNDED FOLLOWING, strict-past
# offsets), multi-level aggregation, conditional-sum matrices,
# string-collation comparison, cast roundtrips. All 26 prototyped
# green on both engines (experiments/cand_r9d.py); drops: two
# collisions with existing corpus ids; decimal-division scale
# differs between engines so quotient shapes ROUND on both sides.
QSCRIPTS_R62 = [
    (
        "gb_position_and_alias_mix",  # groupby_position.q
        """SELECT n_regionkey AS region, length(n_name) AS len, COUNT(*) AS n
           FROM nation GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    (
        "gb_order_by_position_desc",
        """SELECT o_orderstatus, COUNT(*) AS n
           FROM orders GROUP BY o_orderstatus ORDER BY 2 DESC, 1""",
    ),
    (
        "gb_alias_in_having_via_subquery",
        """SELECT * FROM (
             SELECT l_returnflag AS flag, COUNT(*) AS cnt
             FROM lineitem GROUP BY l_returnflag
           ) t WHERE cnt > 1000 ORDER BY flag""",
    ),
    (
        "cte_chain_three_levels",  # cte_3.q
        """WITH a AS (SELECT n_nationkey, n_regionkey FROM nation),
                b AS (SELECT a.n_regionkey, COUNT(*) AS n FROM a GROUP BY a.n_regionkey),
                c AS (SELECT b.n_regionkey, b.n n FROM b WHERE b.n >= 5)
           SELECT r.r_name, c.n FROM c JOIN region r ON c.n_regionkey = r.r_regionkey
           ORDER BY r.r_name""",
    ),
    (
        "cte_used_twice_in_join",  # cte_2.q self-composition
        """WITH top_nations AS (
             SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey < 10
           )
           SELECT a.n_nationkey AS x, b.n_nationkey AS y
           FROM top_nations a JOIN top_nations b
             ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
           ORDER BY x, y""",
    ),
    (
        "cte_shadowing_inner_wins",  # nested WITH: inner definition wins
        """WITH t AS (SELECT 1 AS v)
           SELECT * FROM (
             WITH t AS (SELECT 2 AS v) SELECT v FROM t
           ) q ORDER BY v""",
    ),
    (
        "ord_by_expression_not_selected",
        """SELECT n_name FROM nation
           ORDER BY length(n_name) DESC, n_name LIMIT 10""",
    ),
    (
        "ord_by_case_expression",
        """SELECT o_orderpriority, COUNT(*) AS n FROM orders
           GROUP BY o_orderpriority
           ORDER BY CASE WHEN o_orderpriority LIKE '1%' THEN 0 ELSE 1 END,
                    o_orderpriority""",
    ),
    (
        "in_list_mixed_and_not_in",
        """SELECT n_name FROM nation
           WHERE n_regionkey IN (0, 2, 4) AND n_nationkey NOT IN (0, 1, 2)
           ORDER BY n_name""",
    ),
    (
        "between_boundaries_inclusive",
        """SELECT COUNT(*) AS exact_bounds,
                  SUM(CASE WHEN p_size = 10 OR p_size = 20 THEN 1 ELSE 0 END) AS at_edges
           FROM part WHERE p_size BETWEEN 10 AND 20""",
    ),
    (
        "not_between_complement",
        """SELECT (SELECT COUNT(*) FROM part WHERE p_size BETWEEN 10 AND 20)
                  + (SELECT COUNT(*) FROM part WHERE p_size NOT BETWEEN 10 AND 20)
                  AS total,
                  (SELECT COUNT(*) FROM part) AS expect""",
    ),
    (
        "nullif_chain_division_guard",
        """SELECT l_linenumber,
                  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                       / nullif(SUM(CAST(l_quantity AS DECIMAL(18,2))), 0)
                       AS DOUBLE), 6) AS unit_price
           FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""",
    ),
    (
        "corr_subq_in_case",
        """SELECT r_name,
                  CASE WHEN EXISTS (SELECT 1 FROM nation n
                                    WHERE n.n_regionkey = r.r_regionkey
                                      AND n.n_nationkey > 20)
                       THEN 'has-high' ELSE 'low-only' END AS band
           FROM region r ORDER BY r_name""",
    ),
    (
        "corr_subq_in_select_count",
        """SELECT r_name,
                  (SELECT COUNT(*) FROM nation n
                   WHERE n.n_regionkey = r.r_regionkey) AS nations
           FROM region r ORDER BY r_name""",
    ),
    (
        "win_frame_current_to_unbounded",
        """SELECT l_orderkey, l_linenumber,
                  CAST(SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) AS remaining
           FROM lineitem WHERE l_orderkey < 40
           ORDER BY l_orderkey, l_linenumber""",
    ),
    (
        "win_frame_exclude_current_via_offsets",
        """SELECT s_suppkey,
                  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER (ORDER BY s_suppkey
                       ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS prev2
           FROM supplier ORDER BY s_suppkey""",
    ),
    (
        "win_count_distinct_free_running_flags",
        """SELECT o_orderkey, o_orderstatus,
                  MIN(o_orderstatus) OVER (PARTITION BY o_custkey) AS min_status,
                  MAX(o_orderstatus) OVER (PARTITION BY o_custkey) AS max_status
           FROM orders WHERE o_orderkey < 150
           ORDER BY o_orderkey""",
    ),
    (
        "agg_of_agg_two_levels",  # multi-level aggregation via derived table
        """SELECT AVG(CAST(n AS DOUBLE)) AS avg_group_size,
                  MAX(n) AS biggest
           FROM (SELECT l_partkey, COUNT(*) AS n
                 FROM lineitem GROUP BY l_partkey) t""",
    ),
    (
        "agg_conditional_sum_matrix",
        """SELECT l_returnflag,
                  CAST(SUM(CASE WHEN l_discount > 0.05
                           THEN CAST(l_extendedprice AS DECIMAL(18,2))
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS discounted_rev,
                  CAST(SUM(CASE WHEN l_discount <= 0.05
                           THEN CAST(l_extendedprice AS DECIMAL(18,2))
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS full_rev
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ),
    (
        "union_in_cte_then_window",
        """WITH u AS (
             SELECT n_nationkey AS k, 'n' AS src FROM nation
             UNION ALL
             SELECT r_regionkey AS k, 'r' AS src FROM region
           )
           SELECT k, src, row_number() OVER (PARTITION BY src ORDER BY k) AS rn
           FROM u ORDER BY src, k""",
    ),
    (
        "semi_join_via_in_on_expression",
        """SELECT p_brand, COUNT(*) AS n FROM part
           WHERE p_size + 1 IN (SELECT l_linenumber + 3 FROM lineitem WHERE l_orderkey < 100)
           GROUP BY p_brand ORDER BY p_brand""",
    ),
    (
        "anti_join_via_not_in_nonnull",
        """SELECT COUNT(*) AS n FROM nation
           WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region WHERE r_regionkey < 2)""",
    ),
    (
        "cast_string_number_roundtrips",
        """SELECT n_nationkey,
                  CAST(CAST(n_nationkey AS STRING) AS INT) AS roundtrip,
                  CAST(concat('  ', CAST(n_nationkey AS STRING)) AS INT) AS trimmed_cast
           FROM nation ORDER BY n_nationkey""",
    ),
    (
        "string_comparison_collation_binary",
        """SELECT n_name FROM nation
           WHERE n_name > 'J' AND n_name < 'R' ORDER BY n_name""",
    ),
    (
        "distinct_count_vs_group_count_identity",
        """SELECT (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS via_distinct,
                  (SELECT COUNT(*) FROM (SELECT l_partkey FROM lineitem GROUP BY l_partkey) g)
                  AS via_group""",
    ),
    (
        "join_natural_equiv_explicit",
        """SELECT n.n_name, r.r_name
           FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE r.r_name = 'ASIA' ORDER BY n.n_name""",
    ),
]


# Sixty-third tranche (round 10, the r9 verdict's task 3): the
# windowing_* edge files — windowing_expressions.q (lag/lead
# identities, windowed sums vs running rewrites), windowing_
# multipartitioning.q (several unrelated PARTITION BY specs in one
# select), windowing_rank.q (rank/cume_dist/percent_rank + the
# PTFPPD::process rank-filter shapes over a self-join), windowing_
# navfn.q (row_number/lead/lag/first/last over varied partitions;
# IGNORE NULLS is spelled via aggregate windows, which skip NULLs in
# both engines — the literal IGNORE NULLS keyword parses differently
# in Spark vs DuckDB), windowing_ntile.q, windowing_udaf.q,
# windowing_decimal.q (exact DECIMAL window sums), windowing_
# streaming.q (rank-filter pushdown shapes) and windowing.q's long
# tail. All prototyped green on both engines at sf0.01 + sf0.001.
QSCRIPTS_R63 = [
    (
        "wexpr_sum_lag_lastvalue_identity",
        """SELECT p_brand, p_retailprice, p_size,
               round(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER w1 AS DOUBLE), 2)
               = round(CAST(SUM(CAST(lagged AS DECIMAL(18,2))) OVER w1 AS DOUBLE)
                 + last_value(p_retailprice) OVER w1, 2) AS identity_holds
        FROM (SELECT p_brand, p_retailprice, p_size, p_partkey,
                     lag(p_retailprice, 1, 0.0) OVER (
                       PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS lagged
              FROM part WHERE p_partkey <= 200) l
        WINDOW w1 AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
        ORDER BY p_brand, p_retailprice, p_size""",
    ),
    (
        "wexpr_minmax_firstlast_identity",
        """SELECT p_brand, p_partkey,
               max(p_retailprice) OVER w1 - min(p_retailprice) OVER w1
               = last_value(p_retailprice) OVER w1 - first_value(p_retailprice) OVER w1
               AS range_identity
        FROM part WHERE p_partkey <= 200
        WINDOW w1 AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY p_brand, p_partkey""",
    ),
    (
        "wexpr_rank_runningsum_offset",
        """SELECT p_brand, p_retailprice,
               rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice) AS r,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS s2,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) - 5 AS s1
        FROM part WHERE p_partkey <= 150 ORDER BY p_brand, p_retailprice, p_partkey""",
    ),
    (
        "wexpr_lead_numeric_diff",
        """SELECT c_custkey, c_nationkey,
               c_nationkey - lead(c_nationkey, 3) OVER (
                 PARTITION BY c_mktsegment ORDER BY c_custkey) AS diff3
        FROM customer WHERE c_custkey <= 120 ORDER BY c_custkey""",
    ),
    (
        "wexpr_lead_with_default_zero",
        """SELECT o_orderkey,
               o_custkey - lead(o_custkey, 3, 0) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_orderkey) AS d3
        FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""",
    ),
    (
        "wexpr_lag_numeric_diff",
        """SELECT s_suppkey, s_nationkey,
               s_nationkey - lag(s_nationkey, 3) OVER (
                 PARTITION BY s_nationkey % 4 ORDER BY s_suppkey) AS lag_diff
        FROM supplier ORDER BY s_suppkey""",
    ),
    (
        "wexpr_lag_string_default",
        """SELECT n_nationkey, lag(n_name, 3, 'fred') OVER (
               PARTITION BY n_regionkey ORDER BY n_nationkey) AS lag_name
        FROM nation ORDER BY n_nationkey""",
    ),
    (
        "wexpr_avg_over_partition_only",
        """SELECT p_brand,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER (PARTITION BY p_brand) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_brand) AS brand_avg
        FROM part WHERE p_partkey <= 100 ORDER BY p_brand, brand_avg""",
    ),
    (
        "wexpr_running_avg_rows_frame",
        """SELECT p_brand, p_partkey,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY p_brand ORDER BY p_type, p_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / COUNT(*) OVER (
                 PARTITION BY p_brand ORDER BY p_type, p_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_avg
        FROM part WHERE p_partkey <= 100 ORDER BY p_brand, p_partkey""",
    ),
    (
        "wexpr_window_over_multi_insert_source",
        """WITH tt AS (
          SELECT CAST(SUM(CAST(value AS DECIMAL(18,3))) OVER (
                   PARTITION BY event_type ORDER BY event_id) AS DOUBLE) AS s,
                 event_type
          FROM events WHERE event_id <= 200)
        SELECT s, event_type FROM tt ORDER BY event_type, s LIMIT 30""",
    ),
    (
        "wexpr_sum_lag_plus_const_identity",
        """SELECT p_brand, p_retailprice,
               round(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER w1 AS DOUBLE), 2) + 50.0
               = round(CAST(SUM(CAST(lagged50 AS DECIMAL(18,2))) OVER w1 AS DOUBLE)
                 + last_value(p_retailprice) OVER w1, 2) AS shifted_identity
        FROM (SELECT p_brand, p_retailprice, p_partkey,
                     lag(p_retailprice, 1, 50.0) OVER (
                       PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS lagged50
              FROM part WHERE p_partkey <= 120) l
        WINDOW w1 AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
        ORDER BY p_brand, p_retailprice LIMIT 11""",
    ),
    (
        "wmulti_rank_and_sum_same_partition",
        """SELECT c_mktsegment,
               rank() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS r,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (
                 PARTITION BY c_mktsegment ORDER BY c_custkey) AS DOUBLE) AS s
        FROM customer WHERE c_custkey <= 100 ORDER BY c_mktsegment, r""",
    ),
    (
        "wmulti_rank_desc_sum_other_order",
        """SELECT c_custkey,
               rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS r_bal,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (
                 PARTITION BY c_mktsegment ORDER BY c_custkey DESC) AS DOUBLE) AS s_desc
        FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_custkey <= 80
        ORDER BY c_custkey""",
    ),
    (
        "wmulti_two_disjoint_partitions",
        """SELECT o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_orderstatus) AS DOUBLE) AS by_status,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_orderpriority) AS DOUBLE) AS by_prio
        FROM orders WHERE o_orderkey <= 120 ORDER BY o_orderkey""",
    ),
    (
        "wmulti_rank_by_two_unrelated_keys",
        """SELECT s_suppkey,
               rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS r_nat,
               rank() OVER (PARTITION BY s_suppkey % 3 ORDER BY s_name) AS r_mod
        FROM supplier ORDER BY s_suppkey""",
    ),
    (
        "wmulti_sum_one_part_rownumber_global",
        """SELECT c_custkey,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (
                 PARTITION BY c_nationkey) AS DOUBLE) AS nat_sum,
               row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn
        FROM customer WHERE c_custkey <= 60 ORDER BY c_custkey""",
    ),
    (
        "wmulti_named_window_referenced_twice",  # windowing_
        # multipartitioning.q: ONE named window shared by two different
        # functions (differentiated r11 — was a literal dup of
        # named_windows_two_partitions)
        """SELECT o_orderkey, rank() OVER w AS r,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS running
        FROM orders WHERE o_orderkey <= 100
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
        ORDER BY o_orderkey""",
    ),
    (
        "wrank_rank_over_float_partition",
        """SELECT c_name, rank() OVER (
               PARTITION BY c_acctbal ORDER BY c_nationkey) AS r
        FROM customer WHERE c_custkey <= 100 ORDER BY c_name LIMIT 50""",
    ),
    (
        "wrank_dense_rank_desc_second_key",
        """SELECT o_orderkey, dense_rank() OVER (
               PARTITION BY o_orderdate ORDER BY o_custkey, o_orderkey DESC) AS dr
        FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey LIMIT 100""",
    ),
    (
        "wrank_cume_dist_bool_partition",
        """SELECT c_custkey, cume_dist() OVER (
               PARTITION BY c_acctbal > 0 ORDER BY c_nationkey, c_custkey) AS cd
        FROM customer WHERE c_custkey <= 80 ORDER BY c_custkey""",
    ),
    (
        "wrank_percent_rank_numeric_partition",
        """SELECT p_partkey, percent_rank() OVER (
               PARTITION BY p_size ORDER BY p_retailprice, p_partkey) AS pr
        FROM part WHERE p_partkey <= 150 ORDER BY p_partkey""",
    ),
    (
        "wrank_top1_after_selfjoin",
        """SELECT ts, val, rnk FROM (
          SELECT ts, val, rank() OVER (PARTITION BY ts ORDER BY val) AS rnk
          FROM (SELECT other.o_orderdate AS ts, other.o_totalprice AS val
                FROM orders other JOIN orders o ON other.o_custkey = o.o_custkey
                WHERE other.o_orderkey <= 60 AND o.o_orderkey <= 60) joined
        ) ranked WHERE rnk = 1 ORDER BY ts, val LIMIT 10""",
    ),
    (
        "wrank_filter_on_nonrank_column",
        """SELECT ts, val, rnk FROM (
          SELECT ts, val, rank() OVER (PARTITION BY ts ORDER BY val) AS rnk
          FROM (SELECT other.o_orderdate AS ts, other.o_totalprice AS val
                FROM orders other JOIN orders o ON other.o_custkey = o.o_custkey
                WHERE other.o_orderkey <= 80 AND o.o_orderkey <= 80) joined
        ) ranked WHERE val > 100000 ORDER BY ts, val, rnk LIMIT 10""",
    ),
    (
        "wrank_prejoin_filter_then_rank",
        """SELECT ts, val, rnk FROM (
          SELECT ts, val, rank() OVER (PARTITION BY ts ORDER BY val) AS rnk
          FROM (SELECT other.o_orderdate AS ts, other.o_totalprice AS val
                FROM orders other JOIN orders o ON other.o_custkey = o.o_custkey
                WHERE other.o_orderstatus = 'F'
                  AND other.o_orderkey <= 100 AND o.o_orderkey <= 100) joined
        ) ranked WHERE rnk = 1 ORDER BY ts, val LIMIT 10""",
    ),
    (
        "navfn_rownumber_double_partition",
        """SELECT c_name, row_number() OVER (
               PARTITION BY c_acctbal ORDER BY c_custkey) AS rn
        FROM customer WHERE c_custkey <= 90 ORDER BY c_name""",
    ),
    (
        "navfn_lead_no_default",
        """SELECT p_partkey, lead(p_name) OVER (
               PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS next_name
        FROM part WHERE p_partkey <= 120 ORDER BY p_partkey""",
    ),
    (
        "navfn_lag_decimal_col",
        """SELECT o_orderkey, lag(o_totalprice) OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderkey) AS prev_price
        FROM orders WHERE o_orderkey <= 150 ORDER BY o_orderkey""",
    ),
    (
        "navfn_last_value_running",
        """SELECT s_suppkey, last_value(s_name) OVER (
               PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS lv
        FROM supplier ORDER BY s_suppkey""",
    ),
    (
        "navfn_first_value_bool_partition",
        """SELECT c_custkey, first_value(c_name) OVER (
               PARTITION BY c_acctbal < 0 ORDER BY c_name) AS fv
        FROM customer WHERE c_custkey <= 70 ORDER BY c_custkey""",
    ),
    (
        "navfn_last_value_narrow_filter",
        """SELECT c_nationkey, c_name, last_value(c_custkey) OVER (
               PARTITION BY c_nationkey ORDER BY c_name) AS lv
        FROM customer WHERE c_mktsegment = 'BUILDING' AND c_custkey <= 200
        ORDER BY c_nationkey, c_name""",
    ),
    (
        "navfn_ignore_nulls_via_aggregate",
        """SELECT c_custkey,
               max(CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END) OVER (
                 PARTITION BY c_nationkey ORDER BY c_custkey
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS last_nonnull_near
        FROM customer WHERE c_custkey <= 60 ORDER BY c_custkey""",
    ),
    (
        "navfn_first_value_frame_variants",
        """SELECT p_partkey,
               first_value(p_name) OVER (PARTITION BY p_brand ORDER BY p_partkey
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS fv_near,
               first_value(p_name) OVER (PARTITION BY p_brand ORDER BY p_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS fv_unb
        FROM part WHERE p_partkey <= 80 ORDER BY p_partkey""",
    ),
    (
        "navfn_last_value_frame_variants",
        """SELECT p_partkey,
               last_value(p_name) OVER (PARTITION BY p_brand ORDER BY p_partkey DESC
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS lv_near,
               last_value(p_name) OVER (PARTITION BY p_brand ORDER BY p_partkey DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS lv_unb
        FROM part WHERE p_partkey <= 80 ORDER BY p_partkey""",
    ),
    (
        "ntile_10_within_segment",
        """SELECT c_custkey, ntile(10) OVER (
               PARTITION BY c_mktsegment ORDER BY c_custkey) AS decile
        FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""",
    ),
    (
        "ntile_100_more_tiles_than_rows",
        """SELECT n_nationkey, ntile(100) OVER (
               PARTITION BY n_regionkey ORDER BY n_name) AS t
        FROM nation ORDER BY n_nationkey""",
    ),
    (
        "ntile_4_quartiles_by_price",
        """SELECT o_orderkey, ntile(4) OVER (
               PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders WHERE o_orderkey <= 160 ORDER BY o_orderkey""",
    ),
    (
        "ntile_1000_sparse",
        """SELECT s_suppkey, ntile(1000) OVER (ORDER BY s_acctbal, s_suppkey) AS t
        FROM supplier ORDER BY s_suppkey""",
    ),
    (
        "wudaf_min_partition_only",
        """SELECT c_custkey, min(c_acctbal) OVER (PARTITION BY c_nationkey) AS nat_min
        FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""",
    ),
    (
        "wudaf_max_running_order_by_string",
        """SELECT p_partkey, max(p_size) OVER (
               PARTITION BY p_brand ORDER BY p_name) AS run_max
        FROM part WHERE p_partkey <= 120 ORDER BY p_partkey""",
    ),
    (
        "wudaf_count_star_running",
        """SELECT o_orderkey, COUNT(*) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderkey) AS seen
        FROM orders WHERE o_orderkey <= 120 ORDER BY o_orderkey""",
    ),
    (
        "wudaf_sum_distinct_free_rewrite",
        """SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                 PARTITION BY l_orderkey) AS DOUBLE) AS order_qty
        FROM lineitem WHERE l_orderkey <= 50 ORDER BY l_orderkey, order_qty""",
    ),
    (
        "wdec_sum_decimal_partition",
        """SELECT p_partkey,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(10,2))) OVER (
                 PARTITION BY p_brand ORDER BY p_partkey) AS DOUBLE) AS dec_sum
        FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""",
    ),
    (
        "wdec_min_max_decimal_frame",
        """SELECT o_orderkey,
               CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mn,
               CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mx
        FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""",
    ),
    (
        "wstream_rank_filter_lt4",
        """SELECT * FROM (
          SELECT p_brand, rank() OVER (PARTITION BY p_brand ORDER BY p_name) AS r
          FROM part WHERE p_partkey <= 300) a
        WHERE r < 4 ORDER BY p_brand, r""",
    ),
    (
        "wstream_rank_filter_lt2_top1",
        """SELECT * FROM (
          SELECT p_brand, rank() OVER (PARTITION BY p_brand ORDER BY p_name) AS r
          FROM part WHERE p_partkey <= 300) a
        WHERE r < 2 ORDER BY p_brand""",
    ),
    (
        "wstream_rank_filter_plus_source_pred",
        """SELECT * FROM (
          SELECT c_nationkey, c_acctbal, rank() OVER (
            PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS r
          FROM customer WHERE c_custkey <= 500) a
        WHERE r < 6 AND c_nationkey < 5 ORDER BY c_nationkey, r""",
    ),
    (
        "wstream_rank_null_partition_rows",
        """SELECT * FROM (
          SELECT CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_nationkey END AS nk,
                 c_acctbal, rank() OVER (
                   PARTITION BY CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_nationkey END
                   ORDER BY c_acctbal, c_custkey) AS r
          FROM customer WHERE c_custkey <= 120) a
        WHERE r < 5 AND nk IS NULL ORDER BY c_acctbal""",
    ),
    (
        "wtail_sum_over_sum_expr",
        """SELECT o_orderstatus, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_orderkey) AS DOUBLE)
               - CAST(o_totalprice AS DOUBLE) AS prior_sum
        FROM orders WHERE o_orderkey <= 90 ORDER BY o_orderkey""",
    ),
    (
        "wtail_count_then_outer_agg",
        """SELECT o_orderstatus, MAX(cnt_run) AS max_run FROM (
          SELECT o_orderstatus, COUNT(*) OVER (
            PARTITION BY o_orderstatus ORDER BY o_orderkey) AS cnt_run
          FROM orders WHERE o_orderkey <= 200) x
        GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "wtail_window_past_join",
        """SELECT n_name, s_suppkey, rank() OVER (
               PARTITION BY n_name ORDER BY s_acctbal, s_suppkey) AS r
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        ORDER BY n_name, r LIMIT 60""",
    ),
    (
        "wtail_rows_between_preceding_and_preceding",
        """SELECT c_custkey,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (
                 ORDER BY c_custkey ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS window_sum
        FROM customer WHERE c_custkey <= 40 ORDER BY c_custkey""",
    ),
    (
        "wtail_rows_between_following_and_following",
        """SELECT c_custkey,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (
                 ORDER BY c_custkey ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS DOUBLE) AS ahead_sum
        FROM customer WHERE c_custkey <= 40 ORDER BY c_custkey""",
    ),
    (
        "wtail_range_current_to_unbounded",
        """SELECT p_size, p_partkey,
               COUNT(*) OVER (ORDER BY p_size RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS n_ge
        FROM part WHERE p_partkey <= 60 ORDER BY p_partkey""",
    ),
]

# Sixty-fourth tranche: the join-condition corpus — join_filters.q
# (one-sided predicates INSIDE the ON clause of every join type,
# filter-only ON with no equi condition, chained LEFT-then-RIGHT
# outer joins with overlapping filters), join_nulls.q (NULL keys
# through every join type), join_nullsafe.q (<=> spelled as the
# portable IS NOT DISTINCT FROM) and join_filters_overlap.q
# (constant value predicates on both sides of repeated self outer
# joins — the merged-join-tree dedup shapes). myinput1(key, value)
# with NULLs is re-created as a deterministic CTE over nation (25
# rows at every SF), spelled inline in each entry so one SQL string
# serves both engines.
QSCRIPTS_R64 = [
    (
        "jf_inner_filter_only_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, a.key, a.value, b.id AS bid FROM mi a JOIN mi b
        ON a.key > 1 AND a.value > 2 AND b.key > 1 AND b.value > 2
        ORDER BY a.id, bid LIMIT 60""",
    ),
    (
        "jf_left_filter_only_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid, b.key AS bkey FROM mi a LEFT OUTER JOIN mi b
        ON a.key > 1 AND a.value > 2 AND b.key > 1 AND b.value > 2
        ORDER BY a.id, bid LIMIT 80""",
    ),
    (
        "jf_right_filter_only_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, a.key AS akey, b.id FROM mi a RIGHT OUTER JOIN mi b
        ON a.key > 1 AND a.value > 2 AND b.key > 1 AND b.value > 2
        ORDER BY b.id, aid LIMIT 80""",
    ),
    (
        "jf_inner_key_eq_value_with_filters",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a JOIN mi b
        ON a.key = b.value AND a.key > 0 AND b.value > 0
        ORDER BY a.id, bid LIMIT 100""",
    ),
    (
        "jf_inner_key_eq_key_with_filters",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a JOIN mi b
        ON a.key = b.key AND a.value > 1 AND b.value > 1
        ORDER BY a.id, bid LIMIT 100""",
    ),
    (
        "jf_inner_value_eq_value_with_filters",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a JOIN mi b
        ON a.value = b.value AND a.key > 0 AND b.key > 0
        ORDER BY a.id, bid LIMIT 100""",
    ),
    (
        "jf_inner_both_eq_with_filters",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a JOIN mi b
        ON a.value = b.value AND a.key = b.key AND a.key > 0 AND b.value > 0
        ORDER BY a.id, bid LIMIT 100""",
    ),
    (
        "jf_left_key_eq_value_filters_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a LEFT OUTER JOIN mi b
        ON a.key = b.value AND a.key > 1 AND b.value > 1
        ORDER BY a.id, bid""",
    ),
    (
        "jf_left_value_eq_value_filters_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a LEFT OUTER JOIN mi b
        ON a.value = b.value AND a.value > 2 AND b.key > 1
        ORDER BY a.id, bid""",
    ),
    (
        "jf_left_key_eq_key_leftpred_in_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a LEFT OUTER JOIN mi b
        ON a.key = b.key AND a.id > 10
        ORDER BY a.id, bid""",
    ),
    (
        "jf_left_both_eq_filters_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a LEFT OUTER JOIN mi b
        ON a.key = b.key AND a.value = b.value AND a.key > 1 AND b.value > 2
        ORDER BY a.id, bid""",
    ),
    (
        "jf_right_key_eq_value_filters_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id FROM mi a RIGHT OUTER JOIN mi b
        ON a.key = b.value AND a.key > 1 AND b.value > 1
        ORDER BY b.id, aid""",
    ),
    (
        "jf_right_key_eq_key_rightpred_in_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id FROM mi a RIGHT OUTER JOIN mi b
        ON a.key = b.key AND b.id > 10
        ORDER BY b.id, aid""",
    ),
    (
        "jf_right_both_eq_filters_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id FROM mi a RIGHT OUTER JOIN mi b
        ON a.key = b.key AND a.value = b.value AND a.key > 1 AND b.value > 2
        ORDER BY b.id, aid""",
    ),
    (
        "jf_full_key_eq_value_filters_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid FROM mi a FULL OUTER JOIN mi b
        ON a.key = b.value AND a.key > 1 AND b.value > 1
        ORDER BY aid, bid""",
    ),
    (
        "jf_full_key_eq_key_filters_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid FROM mi a FULL OUTER JOIN mi b
        ON a.key = b.key AND a.value > 2 AND b.value > 2
        ORDER BY aid, bid""",
    ),
    (
        "jf_full_value_eq_value_filters_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid FROM mi a FULL OUTER JOIN mi b
        ON a.value = b.value AND a.key > 1 AND b.key > 1
        ORDER BY aid, bid""",
    ),
    (
        "jf_full_both_eq_filters_on",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid FROM mi a FULL OUTER JOIN mi b
        ON a.value = b.value AND a.key = b.key AND a.key > 0 AND b.value > 1
        ORDER BY aid, bid""",
    ),
    (
        "jf_left_then_right_chain_filters",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid, c.id AS cid
        FROM mi a
        LEFT OUTER JOIN mi b ON (a.value = b.value AND a.key > 1 AND b.key > 1)
        RIGHT OUTER JOIN mi c ON (b.value = c.value AND c.key > 1 AND b.key > 1)
        ORDER BY cid, aid, bid LIMIT 100""",
    ),
    (
        "jf_right_then_left_chain_filters",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid, c.id AS cid
        FROM mi a
        RIGHT OUTER JOIN mi b ON (a.value = b.value AND a.key > 1 AND b.key > 1)
        LEFT OUTER JOIN mi c ON (b.value = c.value AND c.key > 1 AND b.key > 1)
        ORDER BY bid, aid, cid LIMIT 100""",
    ),
    (
        "jf_left_then_right_second_on_key",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid, c.id AS cid
        FROM mi a
        LEFT OUTER JOIN mi b ON (a.value = b.value AND a.key > 1 AND b.key > 1)
        RIGHT OUTER JOIN mi c ON (b.key = c.key AND c.value > 2 AND b.value > 2)
        ORDER BY cid, aid, bid LIMIT 100""",
    ),
    (
        "jn_cross_join_null_rows_survive",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT COUNT(*) AS n FROM mi a CROSS JOIN mi b""",
    ),
    (
        "jn_inner_key_eq_value_nulls_drop",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a JOIN mi b ON a.key = b.value
        ORDER BY a.id, bid LIMIT 100""",
    ),
    (
        "jn_inner_key_eq_key_nulls_drop",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT COUNT(*) AS n,
               COUNT(a.key) AS nonnull_keys
        FROM mi a JOIN mi b ON a.key = b.key""",
    ),
    (
        "jn_inner_value_eq_value_nulls_drop",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a JOIN mi b ON a.value = b.value
        ORDER BY a.id, bid LIMIT 120""",
    ),
    (
        "jn_left_key_eq_value_null_left_kept",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, a.key, b.id AS bid FROM mi a LEFT OUTER JOIN mi b ON a.key = b.value
        ORDER BY a.id, bid LIMIT 120""",
    ),
    (
        "jn_left_both_eq_null_left_kept",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a LEFT OUTER JOIN mi b
        ON a.key = b.key AND a.value = b.value
        ORDER BY a.id, bid""",
    ),
    (
        "jn_right_key_eq_key_null_right_kept",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id, b.key FROM mi a RIGHT OUTER JOIN mi b ON a.key = b.key
        ORDER BY b.id, aid LIMIT 120""",
    ),
    (
        "jn_full_key_eq_value_nulls_both_sides",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid FROM mi a FULL OUTER JOIN mi b ON a.key = b.value
        ORDER BY aid, bid LIMIT 150""",
    ),
    (
        "jn_full_both_eq_nulls_both_sides",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid FROM mi a FULL OUTER JOIN mi b
        ON a.value = b.value AND a.key = b.key
        ORDER BY aid, bid LIMIT 150""",
    ),
    (
        "jn_left_then_right_null_chain",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid, c.id AS cid
        FROM mi a LEFT OUTER JOIN mi b ON a.value = b.value
        RIGHT OUTER JOIN mi c ON b.value = c.value
        ORDER BY cid, aid, bid LIMIT 150""",
    ),
    (
        "jn_right_then_left_null_chain",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid, c.id AS cid
        FROM mi a RIGHT OUTER JOIN mi b ON a.value = b.value
        LEFT OUTER JOIN mi c ON b.value = c.value
        ORDER BY bid, aid, cid LIMIT 150""",
    ),
    (
        "jns_inner_nullsafe_key_value",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a JOIN mi b
        ON a.key IS NOT DISTINCT FROM b.value
        ORDER BY a.id, bid LIMIT 150""",
    ),
    (
        "jns_nullsafe_then_plain_eq_threeway",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid, c.id AS cid FROM mi a
        JOIN mi b ON a.key IS NOT DISTINCT FROM b.value
        JOIN mi c ON a.key = c.key
        ORDER BY a.id, bid, cid LIMIT 150""",
    ),
    (
        "jns_nullsafe_both_joins_threeway",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid, c.id AS cid FROM mi a
        JOIN mi b ON a.key IS NOT DISTINCT FROM b.value
        JOIN mi c ON a.key IS NOT DISTINCT FROM c.key
        ORDER BY a.id, bid, cid LIMIT 150""",
    ),
    (
        "jns_mixed_nullsafe_and_eq_conjunct",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid, c.id AS cid FROM mi a
        JOIN mi b ON a.key IS NOT DISTINCT FROM b.value AND a.value = b.key
        JOIN mi c ON a.key IS NOT DISTINCT FROM c.key AND a.value = c.value
        ORDER BY a.id, bid, cid LIMIT 150""",
    ),
    (
        "jns_double_nullsafe_conjunct",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid, c.id AS cid FROM mi a
        JOIN mi b ON a.key IS NOT DISTINCT FROM b.value
                 AND a.value IS NOT DISTINCT FROM b.key
        JOIN mi c ON a.key IS NOT DISTINCT FROM c.key
                 AND a.value IS NOT DISTINCT FROM c.value
        ORDER BY a.id, bid, cid LIMIT 150""",
    ),
    (
        "jns_left_outer_nullsafe",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a LEFT OUTER JOIN mi b
        ON a.key IS NOT DISTINCT FROM b.value
        ORDER BY a.id, bid LIMIT 150""",
    ),
    (
        "jns_right_outer_nullsafe",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id FROM mi a RIGHT OUTER JOIN mi b
        ON a.key IS NOT DISTINCT FROM b.value
        ORDER BY b.id, aid LIMIT 150""",
    ),
    (
        "jns_full_outer_nullsafe",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid FROM mi a FULL OUTER JOIN mi b
        ON a.key IS NOT DISTINCT FROM b.value
        ORDER BY aid, bid LIMIT 150""",
    ),
    (
        "jns_nullsafe_with_is_null_conjunct",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a JOIN mi b
        ON a.key IS NOT DISTINCT FROM b.value AND a.key IS NULL
        ORDER BY a.id, bid LIMIT 150""",
    ),
    (
        "jns_nullsafe_on_both_null_literal",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT COUNT(*) AS null_pairs FROM mi a JOIN mi b
        ON a.key IS NOT DISTINCT FROM b.key
        WHERE a.key IS NULL""",
    ),
    (
        "jfo_left_left_const_overlap",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid, c.id AS cid
        FROM mi a
        LEFT OUTER JOIN mi b ON (a.key = b.key AND a.value = 5 AND b.value = 5)
        LEFT OUTER JOIN mi c ON (a.key = c.key AND a.value = 6 AND c.value = 6)
        ORDER BY aid, bid, cid""",
    ),
    (
        "jfo_right_then_left_const_overlap",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid, c.id AS cid
        FROM mi a
        RIGHT OUTER JOIN mi b ON (a.key = b.key AND a.value = 5 AND b.value = 5)
        LEFT OUTER JOIN mi c ON (b.key = c.key AND b.value = 6 AND c.value = 6)
        ORDER BY bid, aid, cid""",
    ),
    (
        "jfo_right_left_extra_range_preds",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid, c.id AS cid
        FROM mi a
        RIGHT OUTER JOIN mi b ON (a.key = b.key AND a.value = 5 AND b.value = 5 AND b.value > 1)
        LEFT OUTER JOIN mi c ON (b.key = c.key AND b.value = 6 AND b.value > 2 AND c.value = 6)
        ORDER BY bid, aid, cid""",
    ),
    (
        "jfo_full_then_left_then_left",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid, c.id AS cid, d.id AS did
        FROM mi a
        FULL OUTER JOIN mi b ON (a.key = b.key AND a.value = 5 AND b.value = 5)
        LEFT OUTER JOIN mi c ON (b.key = c.key AND b.value = 6 AND c.value = 6)
        LEFT OUTER JOIN mi d ON (a.key = d.key AND a.value = 4 AND d.value = 4)
        ORDER BY aid, bid, cid, did""",
    ),
    (
        "jfo_left_left_left_const_overlap",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid, c.id AS cid, d.id AS did
        FROM mi a
        LEFT OUTER JOIN mi b ON (a.key = b.key AND a.value = 5 AND b.value = 5)
        LEFT OUTER JOIN mi c ON (a.key = c.key AND a.value = 6 AND c.value = 6)
        LEFT OUTER JOIN mi d ON (a.key = d.key AND a.value = 4 AND d.value = 4)
        ORDER BY aid, bid, cid, did""",
    ),
]

# Sixty-fifth tranche: predicate pushdown (ppd_*.q) and sorted/
# bucketed group-by (groupby_sort_*.q) families — filters split
# around GROUP BY and joins (ppd1/ppd2/ppd_gby/ppd_gby_join),
# outer-join WHERE vs ON placement (ppd_outer_join1-5, including the
# null-filtering predicate that legally converts LEFT OUTER to
# inner), derived-column pushdown barriers (ppd_udf_col with the
# nondeterministic rand() replaced by deterministic derived columns
# — the PUSHDOWN BARRIER is the shape, not the randomness),
# constant folding (ppd_constant_where/expr), repeated aliases,
# union pushdown (ppd_union), and groupby_sort_1-9's grouped-by-
# sorted-key shapes (constants in GROUP BY, key+key expressions,
# grouped subquery joins, union of group-bys).
QSCRIPTS_R65 = [
    (
        "ppd_filter_below_gby_then_above",
        """SELECT c1 FROM (
          SELECT o_orderpriority AS c1, COUNT(o_orderkey) AS c2
          FROM orders WHERE o_orderpriority > '1' GROUP BY o_orderpriority) src1
        WHERE c1 > '2' AND (c2 > 30 OR c1 < '4') ORDER BY c1""",
    ),
    (
        "ppd_gby_regrouped_above",
        """SELECT MAX(c1) AS mx, c2 FROM (
          SELECT o_orderpriority AS c1, COUNT(o_orderkey) AS c2
          FROM orders WHERE o_orderpriority > '1' GROUP BY o_orderpriority) src1
        WHERE c1 > '2' AND (c2 > 30 OR c1 < '5')
        GROUP BY c2 ORDER BY c2, mx""",
    ),
    (
        "ppd_distribute_sort_inner",
        """SELECT b.o_custkey, b.cc FROM (
          SELECT a.o_custkey, COUNT(a.o_orderkey) AS cc
          FROM orders a WHERE a.o_custkey < 200
          GROUP BY a.o_custkey
          ORDER BY a.o_custkey, cc DESC) b
        WHERE b.cc > 1 ORDER BY b.o_custkey, b.cc""",
    ),
    (
        "ppd_join_mixed_residual_preds",
        """SELECT src1.c1, COUNT(*) AS n FROM
          (SELECT o_custkey AS c1, o_orderpriority AS c2 FROM orders WHERE o_custkey > 1) src1
        JOIN
          (SELECT o_custkey AS c3, o_orderstatus AS c4 FROM orders WHERE o_custkey > 2) src2
        ON src1.c1 = src2.c3 AND src1.c1 < 400
        WHERE src1.c1 > 20 AND (src1.c2 < '4' OR src1.c1 > 2)
          AND (src2.c3 > 50 OR src1.c1 < 50) AND (src2.c3 <> 4)
        GROUP BY src1.c1 ORDER BY src1.c1 LIMIT 40""",
    ),
    (
        "ppd_join_string_range_preds",
        """SELECT a.n_name, a.n_nationkey, b.n_name AS bn
        FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
        WHERE a.n_name > 'NATION_1' AND a.n_name < 'NATION_4'
          AND b.n_name > 'NATION_2' AND b.n_name < 'NATION_8'
        ORDER BY a.n_name, bn""",
    ),
    (
        "ppd_join_subquery_only_one_filtered",
        """SELECT src1.c1, src2.c4 FROM
          (SELECT c_custkey AS c1, c_mktsegment AS c2 FROM customer) src1
        JOIN
          (SELECT c_custkey AS c3, c_nationkey AS c4 FROM customer WHERE c_custkey > 2) src2
        ON src1.c1 = src2.c3
        WHERE src1.c1 < 120 ORDER BY src1.c1""",
    ),
    (
        "ppd_left_outer_where_both_sides",
        """SELECT a.c_custkey, a.c_name, b.c_custkey AS bk, b.c_name AS bn
        FROM customer a LEFT OUTER JOIN customer b ON a.c_custkey = b.c_custkey
        WHERE a.c_custkey > 10 AND a.c_custkey < 60 AND b.c_custkey > 30 AND b.c_custkey < 80
        ORDER BY a.c_custkey""",
    ),
    (
        "ppd_right_outer_where_both_sides",
        """SELECT a.c_custkey, b.c_custkey AS bk
        FROM customer a RIGHT OUTER JOIN customer b ON a.c_custkey = b.c_custkey
        WHERE a.c_custkey > 10 AND a.c_custkey < 60 AND b.c_custkey > 30 AND b.c_custkey < 80
        ORDER BY a.c_custkey""",
    ),
    (
        "ppd_full_outer_where_both_sides",
        """SELECT a.c_custkey, b.c_custkey AS bk
        FROM customer a FULL OUTER JOIN customer b ON a.c_custkey = b.c_custkey
        WHERE a.c_custkey > 10 AND a.c_custkey < 60 AND b.c_custkey > 30 AND b.c_custkey < 80
        ORDER BY a.c_custkey""",
    ),
    (
        "ppd_outer_join_becomes_inner",
        """SELECT a.c_custkey, b.c_name
        FROM customer a LEFT OUTER JOIN customer b ON a.c_custkey = b.c_custkey
        WHERE b.c_acctbal > 0 AND a.c_custkey <= 100
        ORDER BY a.c_custkey""",
    ),
    (
        "ppd_udf_col_const_expr_alias",
        """SELECT o_orderkey, h4 FROM (
          SELECT *, CAST(o_orderkey * 0 + 4 AS INT) AS h4 FROM orders WHERE o_orderkey = 100) a
        WHERE h4 = 4""",
    ),
    (
        "ppd_udf_col_derived_value",
        """SELECT o_orderkey, v10 FROM (
          SELECT *, o_custkey * 10 AS v10 FROM orders WHERE o_orderkey < 50) a
        WHERE v10 >= 0 ORDER BY o_orderkey""",
    ),
    (
        "ppd_constant_where_true",
        """SELECT COUNT(*) AS n FROM nation WHERE 'a' = 'a'""",
    ),
    (
        "ppd_constant_expr_null_arith",
        """SELECT 4 + CAST(NULL AS INT) AS plus_null,
               n_nationkey - CAST(NULL AS INT) AS minus_null,
               CAST(NULL AS INT) + CAST(NULL AS INT) AS both_null
        FROM nation WHERE n_nationkey < 3 ORDER BY n_nationkey""",
    ),
    (
        "ppd_repeated_alias_nested",
        """SELECT sub.key1, sub.cnt FROM (
          SELECT key1, COUNT(*) AS cnt FROM (
            SELECT n_regionkey AS key1 FROM nation WHERE n_regionkey > 0) t
          GROUP BY key1) sub
        WHERE sub.key1 > 1 ORDER BY sub.key1""",
    ),
    (
        "ppd_same_alias_two_levels",
        """SELECT a.k, a.n FROM (
          SELECT k, COUNT(*) AS n FROM (
            SELECT o_orderstatus AS k FROM orders WHERE o_orderkey < 500) a
          GROUP BY k) a
        WHERE a.n > 1 ORDER BY a.k""",
    ),
    (
        "ppd_union_pushdown_both_branches",
        """SELECT key, v FROM (
          SELECT c_custkey AS key, c_acctbal AS v FROM customer
          UNION ALL
          SELECT s_suppkey AS key, s_acctbal AS v FROM supplier) u
        WHERE key < 15 AND v > 0 ORDER BY key, v""",
    ),
    (
        "ppd_union_one_branch_filtered",
        """SELECT key, src FROM (
          SELECT n_nationkey AS key, 'n' AS src FROM nation WHERE n_regionkey = 1
          UNION ALL
          SELECT r_regionkey AS key, 'r' AS src FROM region) u
        WHERE key < 10 ORDER BY src, key""",
    ),
    (
        "ppd_union_then_join",
        """SELECT u.key, r_name FROM (
          SELECT n_regionkey AS key FROM nation
          UNION ALL
          SELECT r_regionkey AS key FROM region) u
        JOIN region ON u.key = r_regionkey
        WHERE u.key < 3 ORDER BY u.key, r_name""",
    ),
    (
        "ppd_derived_field_garbage",
        """SELECT id, field_a FROM (
          SELECT n_nationkey AS id, upper(n_name) AS field_a,
                 n_regionkey * 2 AS field_b
          FROM nation) t
        WHERE field_b > 4 AND id < 20 ORDER BY id""",
    ),
    (
        "ppd_shared_source_two_sinks_union",
        """WITH src AS (SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey < 60)
        SELECT 'low' AS sink, c_custkey FROM src WHERE c_nationkey < 10
        UNION ALL
        SELECT 'high' AS sink, c_custkey FROM src WHERE c_nationkey >= 10
        ORDER BY sink, c_custkey""",
    ),
    (
        "ppd_join_chain_after_filtered_cte",
        """WITH t AS (SELECT r_regionkey AS id FROM region WHERE r_name <> 'ASIA')
        SELECT t1.id, t2.id AS id2, t3.id AS id3
        FROM t t1 JOIN t t2 ON t1.id = t2.id
        LEFT OUTER JOIN t t3 ON t2.id = t3.id AND t3.id > 1
        ORDER BY t1.id""",
    ),
    (
        "ppd_join_on_expr_vs_where_expr",
        """SELECT a.p_partkey, b.p_partkey AS bk
        FROM part a JOIN part b ON a.p_partkey + 1 = b.p_partkey
        WHERE a.p_size > 30 AND b.p_size < 20 AND a.p_partkey < 300
        ORDER BY a.p_partkey""",
    ),
    (
        "ppd_cluster_like_two_key_sort",
        """SELECT o_custkey, COUNT(*) AS cc FROM orders
        WHERE o_custkey BETWEEN 10 AND 80 GROUP BY o_custkey
        ORDER BY o_custkey, cc DESC""",
    ),
    (
        "gbs_count_by_key",
        """SELECT o_orderstatus AS key, COUNT(1) AS cnt FROM orders
        GROUP BY o_orderstatus ORDER BY key""",
    ),
    (
        "gbs_count_by_key_and_val",
        """SELECT o_orderstatus AS key, o_orderpriority AS val, COUNT(1) AS cnt
        FROM orders GROUP BY o_orderstatus, o_orderpriority ORDER BY key, val""",
    ),
    (
        "gbs_group_by_key_plus_key",
        """SELECT n_regionkey + n_regionkey AS kk, COUNT(1) AS cnt
        FROM nation GROUP BY n_regionkey + n_regionkey ORDER BY kk""",
    ),
    (
        "gbs_group_via_projection_subquery",
        """SELECT k, COUNT(1) AS cnt FROM (
          SELECT n_regionkey AS k, n_name AS v FROM nation) subq1
        GROUP BY k ORDER BY k""",
    ),
    (
        "gbs_constant_in_group_by_position",
        """SELECT 1 AS one, n_regionkey, COUNT(1) AS cnt
        FROM nation GROUP BY 1, n_regionkey ORDER BY n_regionkey""",
    ),
    (
        "gbs_key_const_val_group",
        """SELECT n_regionkey AS key, 1 AS c1, n_name AS val, COUNT(1) AS cnt
        FROM nation GROUP BY n_regionkey, 1, n_name ORDER BY key, val""",
    ),
    (
        "gbs_two_consts_interleaved",
        """SELECT n_regionkey AS key, 1 AS c1, n_name AS val, 2 AS c2, COUNT(1) AS cnt
        FROM nation GROUP BY n_regionkey, 1, n_name, 2 ORDER BY key, val""",
    ),
    (
        "gbs_key_and_key_plus_one",
        """SELECT n_regionkey AS key, n_regionkey + 1 AS key1, COUNT(1) AS cnt
        FROM nation GROUP BY n_regionkey, n_regionkey + 1 ORDER BY key""",
    ),
    (
        "gbs_outer_sum_over_two_group_bys",
        """SELECT kk, SUM(cnt) AS total FROM (
          SELECT o_custkey + o_custkey AS kk, COUNT(1) AS cnt
          FROM orders WHERE o_custkey < 100 GROUP BY o_custkey + o_custkey
        ) x GROUP BY kk ORDER BY kk""",
    ),
    (
        "gbs_join_two_grouped_subqueries",
        """SELECT subq1.key, subq1.cnt + subq2.cnt AS total FROM
          (SELECT o_orderstatus AS key, COUNT(1) AS cnt FROM orders GROUP BY o_orderstatus) subq1
        JOIN
          (SELECT o_orderstatus AS key, COUNT(1) AS cnt FROM orders GROUP BY o_orderstatus) subq2
        ON subq1.key = subq2.key ORDER BY subq1.key""",
    ),
    (
        "gbs_join_grouped_with_detail",
        """SELECT subq2.key, subq2.cnt, x.o_orderkey FROM
          (SELECT o_orderstatus AS key, COUNT(1) AS cnt FROM orders GROUP BY o_orderstatus) subq2
        JOIN (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey <= 8) x
        ON subq2.key = x.o_orderstatus ORDER BY x.o_orderkey""",
    ),
    (
        "gbs_group_by_val_not_sort_key",
        """SELECT o_orderpriority AS val, COUNT(1) AS cnt FROM orders
        GROUP BY o_orderpriority ORDER BY val""",
    ),
    (
        "gbs_union_of_two_group_bys",
        """SELECT key, cnt FROM (
          SELECT n_regionkey AS key, COUNT(1) AS cnt FROM nation GROUP BY n_regionkey
          UNION ALL
          SELECT r_regionkey AS key, COUNT(1) AS cnt FROM region GROUP BY r_regionkey) u
        ORDER BY key, cnt""",
    ),
    (
        "gbs_filtered_partition_style_pred",
        """SELECT o_orderstatus AS key, COUNT(1) AS cnt FROM orders
        WHERE o_orderdate < TIMESTAMP '2023-07-01 00:00:00'
        GROUP BY o_orderstatus ORDER BY key""",
    ),
    (
        "gbs_distinct_vs_group_identity",
        """SELECT DISTINCT n_regionkey FROM nation ORDER BY n_regionkey""",
    ),
    (
        "gbs_count_distinct_by_group",
        """SELECT o_orderstatus, COUNT(DISTINCT o_orderpriority) AS n_prio
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "gbs_max_of_count_subquery",
        """SELECT MAX(cnt) AS max_cnt FROM (
          SELECT COUNT(1) AS cnt FROM orders GROUP BY o_custkey) x""",
    ),
    (
        "wprune_only_window_col_projected",
        """SELECT r FROM (
          SELECT rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS r
          FROM customer WHERE c_custkey <= 50) t
        WHERE r <= 3 ORDER BY r""",
    ),
    (
        "wprune_partition_col_dropped",
        """SELECT c_custkey, r FROM (
          SELECT c_custkey, c_mktsegment,
                 rank() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS r
          FROM customer WHERE c_custkey <= 60) t
        ORDER BY c_custkey""",
    ),
    (
        "wadjust_large_partition_running_count",
        """SELECT l_orderkey, l_linenumber,
               COUNT(*) OVER (ORDER BY l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rn
        FROM lineitem WHERE l_orderkey <= 40 ORDER BY l_orderkey, l_linenumber""",
    ),
]

# Sixty-sixth tranche: long-tail completions — windowing.q shapes not
# yet covered (aggregate-of-aggregate windows, mixed ROWS/RANGE
# frames in one select, windows over join/group-by results),
# join_nulls.q's unmatched-row and COUNT(col)-vs-COUNT(*) semantics,
# groupby_sort_10/11's distinct-over-sorted shapes, ppd_gby2's
# OR-heavy residuals, ppd through LIMIT/UNION DISTINCT boundaries,
# and windowing over NULL-bearing keys (rank with NULLS FIRST, lag
# edges, SUM skipping NULLs). The null-bearing mi CTE matches the
# R64 tranche's.
QSCRIPTS_R66 = [
    (
        "wlong_three_functions_one_window",
        """SELECT p_brand, p_partkey,
               rank() OVER w AS r, dense_rank() OVER w AS dr,
               row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS rn
        FROM part WHERE p_partkey <= 100
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice)
        ORDER BY p_brand, p_partkey""",
    ),
    (
        "wlong_mixed_rows_and_range_frames",
        """SELECT o_orderkey,
               COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS near_n,
               COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS upto_n
        FROM orders WHERE o_orderkey <= 80 ORDER BY o_orderkey""",
    ),
    (
        "wlong_window_after_group_by",
        """SELECT o_orderstatus, n,
               rank() OVER (ORDER BY n DESC, o_orderstatus) AS size_rank
        FROM (SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus) g
        ORDER BY size_rank""",
    ),
    (
        "wlong_window_arg_is_aggregate",
        """SELECT o_orderstatus,
               CAST(SUM(SUM(CAST(o_totalprice AS DECIMAL(18,2)))) OVER (
                 ORDER BY o_orderstatus) AS DOUBLE) AS running_total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "wlong_lead_over_join_result",
        """SELECT n_name, s_suppkey,
               lead(s_suppkey) OVER (PARTITION BY n_name ORDER BY s_suppkey) AS next_supp
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        ORDER BY n_name, s_suppkey""",
    ),
    (
        "wlong_rank_on_expression_key",
        """SELECT c_custkey, rank() OVER (
               PARTITION BY c_nationkey % 3 ORDER BY c_acctbal * 2, c_custkey) AS r
        FROM customer WHERE c_custkey <= 90 ORDER BY c_custkey""",
    ),
    (
        "wlong_ntile_after_where_on_rank",
        """SELECT * FROM (
          SELECT c_custkey,
                 rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS r,
                 ntile(3) OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS t
          FROM customer WHERE c_custkey <= 100) x
        WHERE r <= 5 ORDER BY c_custkey""",
    ),
    (
        "wlong_count_distinct_free_over_group",
        """SELECT l_returnflag, l_linestatus, n_lines,
               CAST(SUM(n_lines) OVER (PARTITION BY l_returnflag) AS BIGINT) AS flag_lines
        FROM (SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines
              FROM lineitem GROUP BY l_returnflag, l_linestatus) g
        ORDER BY l_returnflag, l_linestatus""",
    ),
    (
        "wlong_first_last_same_window",
        """SELECT p_partkey,
               first_value(p_retailprice) OVER w AS fv,
               last_value(p_retailprice) OVER w AS lv
        FROM part WHERE p_partkey <= 60
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_partkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY p_partkey""",
    ),
    (
        "wlong_window_in_having_subquery",
        """SELECT o_orderstatus, total FROM (
          SELECT o_orderstatus,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM orders GROUP BY o_orderstatus) g
        WHERE total > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / 10
                       FROM orders)
        ORDER BY o_orderstatus""",
    ),
    (
        "jn_left_where_right_key_null",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id, b.id AS bid FROM mi a LEFT OUTER JOIN mi b ON a.key = b.key
        WHERE b.id IS NULL ORDER BY a.id""",
    ),
    (
        "jn_right_where_left_key_null",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id FROM mi a RIGHT OUTER JOIN mi b ON a.key = b.key
        WHERE a.id IS NULL ORDER BY b.id""",
    ),
    (
        "jn_full_only_unmatched_rows",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.id AS aid, b.id AS bid FROM mi a FULL OUTER JOIN mi b ON a.key = b.value
        WHERE a.id IS NULL OR b.id IS NULL ORDER BY aid, bid""",
    ),
    (
        "jn_count_cols_vs_rows_outer",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT COUNT(*) AS rows_n, COUNT(b.id) AS matched_n,
               COUNT(a.key) AS left_keys, COUNT(b.key) AS right_keys
        FROM mi a LEFT OUTER JOIN mi b ON a.key = b.key""",
    ),
    (
        "jn_groupby_over_outer_join",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT a.key, COUNT(b.id) AS matches FROM mi a LEFT OUTER JOIN mi b
        ON a.key = b.key GROUP BY a.key ORDER BY a.key NULLS FIRST""",
    ),
    (
        "jn_null_key_never_self_matches",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT COUNT(*) AS self_pairs FROM mi a JOIN mi b
        ON a.key = b.key AND a.id = b.id""",
    ),
    (
        "gbs10_distinct_projection",
        """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        WHERE o_orderkey <= 200 ORDER BY o_orderstatus, o_orderpriority""",
    ),
    (
        "gbs11_count_distinct_no_group",
        """SELECT COUNT(DISTINCT o_orderstatus) AS n FROM orders""",
    ),
    (
        "gbs11_count_and_count_distinct",
        """SELECT COUNT(1) AS n, COUNT(DISTINCT o_orderstatus) AS nd FROM orders""",
    ),
    (
        "gbs11_sum_distinct_ints",
        """SELECT CAST(SUM(DISTINCT n_regionkey) AS BIGINT) AS sd FROM nation""",
    ),
    (
        "gbs11_group_on_constant",
        """SELECT 'x' AS k, COUNT(1) AS n FROM nation GROUP BY 'x'""",
    ),
    (
        "ppd_gby2_max_with_or_preds",
        """SELECT MAX(c1) AS mx, c2 FROM (
          SELECT o_orderpriority AS c1, COUNT(o_orderkey) AS c2
          FROM orders WHERE o_orderpriority > '1' GROUP BY o_orderpriority) src1
        WHERE c1 > '2' AND (c2 > 250 OR c1 < '3')
        GROUP BY c2 ORDER BY mx, c2""",
    ),
    (
        "ppd_having_or_with_count",
        """SELECT o_custkey, COUNT(*) AS n FROM orders
        WHERE o_custkey < 120 GROUP BY o_custkey
        HAVING COUNT(*) > 3 OR o_custkey < 10
        ORDER BY o_custkey""",
    ),
    (
        "ppd_above_limit_not_pushed",
        """SELECT * FROM (
          SELECT o_orderkey, o_totalprice FROM orders
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 50) top50
        WHERE o_orderkey % 2 = 0 ORDER BY o_orderkey""",
    ),
    (
        "ppd_below_union_distinct",
        """SELECT key FROM (
          SELECT n_regionkey AS key FROM nation
          UNION
          SELECT r_regionkey AS key FROM region) u
        WHERE key >= 2 ORDER BY key""",
    ),
    (
        "ppd_threeway_residual_or",
        """SELECT a.n_nationkey, b.n_nationkey AS bk, c.n_nationkey AS ck
        FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
        JOIN nation c ON b.n_nationkey = c.n_nationkey
        WHERE (a.n_nationkey < 5 OR b.n_nationkey < 5) AND c.n_regionkey > 1
        ORDER BY a.n_nationkey, bk, ck LIMIT 60""",
    ),
    (
        "ppd_join_pred_on_both_inputs_or",
        """SELECT o.o_orderkey, c.c_custkey
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE (o.o_totalprice > 300000 OR c.c_acctbal < 0) AND o.o_orderkey <= 400
        ORDER BY o.o_orderkey""",
    ),
    (
        "gbs_two_aggs_same_source_union",
        """WITH src AS (SELECT o_orderstatus AS key, o_orderpriority AS val
                     FROM orders WHERE o_orderkey <= 300)
        SELECT key, CAST(NULL AS STRING) AS val, COUNT(1) AS cnt FROM src GROUP BY key
        UNION ALL
        SELECT key, val, COUNT(1) AS cnt FROM src GROUP BY key, val
        ORDER BY key, val NULLS FIRST, cnt""",
    ),
    (
        "gbs_agg_of_key_expr_twice",
        """SELECT kk, SUM(cnt) AS total FROM (
          SELECT n_regionkey + n_regionkey AS kk, COUNT(1) AS cnt
          FROM nation GROUP BY n_regionkey + n_regionkey) x
        GROUP BY kk ORDER BY kk""",
    ),
    (
        "gbs_nested_subquery_rename_chain",
        """SELECT k2, COUNT(1) AS n FROM (
          SELECT k1 AS k2 FROM (
            SELECT n_regionkey AS k1 FROM nation) a) b
        GROUP BY k2 ORDER BY k2""",
    ),
    (
        "wnull_rank_null_order_key",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT id, rank() OVER (ORDER BY key NULLS FIRST, id) AS r
        FROM mi ORDER BY id""",
    ),
    (
        "wnull_lag_returns_null_at_edges",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT id, lag(key) OVER (ORDER BY id) AS prev_key,
               lead(key) OVER (ORDER BY id) AS next_key
        FROM mi ORDER BY id""",
    ),
    (
        "wnull_sum_skips_null_values",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT id, CAST(SUM(value) OVER (ORDER BY id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS s3
        FROM mi ORDER BY id""",
    ),
    (
        "wnull_count_col_vs_star_window",
        """WITH mi AS (
  SELECT n_nationkey AS id,
         CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS key,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey % 7 END AS value
  FROM nation)
        SELECT id, COUNT(key) OVER (ORDER BY id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nonnull_upto,
               COUNT(*) OVER (ORDER BY id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rows_upto
        FROM mi ORDER BY id""",
    ),
    (
        "ppd_between_in_mixed_pushdown",
        """SELECT p_partkey, p_brand FROM (
          SELECT * FROM part WHERE p_size BETWEEN 10 AND 40) t
        WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AND p_partkey < 250
        ORDER BY p_partkey""",
    ),
    (
        "ppd_not_between_negation",
        """SELECT COUNT(*) AS n FROM part
        WHERE p_size NOT BETWEEN 10 AND 40 AND p_partkey < 300""",
    ),
]

# Sixty-seventh tranche: the correlation-optimizer corpus
# (correlationoptimizer1-15.q) — aggregation directly above a join
# per join type, joins of two grouped subqueries, regroup above a
# grouped join, unions of grouped branches re-grouped, shared-scan
# multi-output shapes — plus the auto_join long tail (expression
# keys, OR-of-equi conditions, scalar-subquery join) and the
# remaining groupby_N.q / multi_insert shapes. The scripts checksum
# with SUM(HASH(..)), which is engine-specific; the portable
# certificate here sums the key/count columns directly. LEFT SEMI
# JOIN is spelled as EXISTS (DuckDB has no SEMI keyword; Catalyst
# plans both as LeftSemi). All prototyped green on both engines at
# sf0.01 + sf0.001.
QSCRIPTS_R67 = [
    (
        "corr_agg_over_inner_join",
        """SELECT SUM(tmp.key) AS sum_key, SUM(tmp.cnt) AS sum_cnt
        FROM (SELECT x.c_custkey AS key, COUNT(1) AS cnt
              FROM customer x JOIN orders y ON x.c_custkey = y.o_custkey
              GROUP BY x.c_custkey) tmp""",
    ),
    (
        "corr_agg_over_semi_join",
        """SELECT SUM(tmp.key) AS sum_key, SUM(tmp.cnt) AS sum_cnt
        FROM (SELECT x.c_custkey AS key, COUNT(1) AS cnt
              FROM customer x
              WHERE EXISTS (SELECT 1 FROM orders y WHERE x.c_custkey = y.o_custkey)
              GROUP BY x.c_custkey) tmp""",
    ),
    (
        "corr_agg_over_left_join_left_key",
        """SELECT SUM(tmp.key) AS sum_key, SUM(tmp.cnt) AS sum_cnt
        FROM (SELECT x.c_custkey AS key, COUNT(1) AS cnt
              FROM customer x LEFT OUTER JOIN orders y ON x.c_custkey = y.o_custkey
              GROUP BY x.c_custkey) tmp""",
    ),
    (
        "corr_agg_over_left_join_right_key",
        """SELECT SUM(tmp.key) AS sum_key, SUM(tmp.cnt) AS sum_cnt
        FROM (SELECT y.o_custkey AS key, COUNT(1) AS cnt
              FROM customer x LEFT OUTER JOIN orders y ON x.c_custkey = y.o_custkey
              GROUP BY y.o_custkey) tmp""",
    ),
    (
        "corr_agg_over_right_join_right_key",
        """SELECT SUM(tmp.key) AS sum_key, SUM(tmp.cnt) AS sum_cnt
        FROM (SELECT y.o_custkey AS key, COUNT(1) AS cnt
              FROM customer x RIGHT OUTER JOIN orders y ON x.c_custkey = y.o_custkey
              GROUP BY y.o_custkey) tmp""",
    ),
    (
        "corr_agg_over_full_join",
        """SELECT SUM(tmp.key) AS sum_key, SUM(tmp.cnt) AS sum_cnt
        FROM (SELECT x.s_suppkey AS key, COUNT(1) AS cnt
              FROM supplier x FULL OUTER JOIN customer y ON x.s_suppkey = y.c_custkey
              GROUP BY x.s_suppkey) tmp""",
    ),
    (
        "corr_join_two_grouped_subqueries",
        """SELECT SUM(xx.key) AS s1, SUM(xx.cnt) AS s2, SUM(yy.cnt) AS s3
        FROM (SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) xx
        JOIN (SELECT c_custkey AS key, COUNT(*) AS cnt FROM customer GROUP BY c_custkey) yy
        ON xx.key = yy.key""",
    ),
    (
        "corr_grouped_join_then_group_again",
        """SELECT tmp.key AS key, SUM(tmp.sum1) AS total1, SUM(tmp.sum2) AS total2 FROM
          (SELECT xx.key AS key, SUM(xx.cnt) AS sum1, SUM(yy.cnt) AS sum2
           FROM (SELECT s_nationkey AS key, COUNT(*) AS cnt FROM supplier GROUP BY s_nationkey) xx
           JOIN (SELECT c_nationkey AS key, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey) yy
           ON xx.key = yy.key GROUP BY xx.key) tmp
        GROUP BY tmp.key ORDER BY key""",
    ),
    (
        "corr_join_grouped_with_raw_then_agg",
        """SELECT SUM(yy.key) AS s_key, SUM(yy.cnt) AS s_cnt FROM
          (SELECT x.n_regionkey AS key, COUNT(1) AS cnt
           FROM nation x JOIN nation y ON x.n_nationkey = y.n_nationkey
           GROUP BY x.n_regionkey) yy""",
    ),
    (
        "corr_union_of_grouped_then_group",
        """SELECT key, SUM(cnt) AS total FROM (
          SELECT o_custkey AS key, COUNT(1) AS cnt FROM orders WHERE o_custkey > 100 GROUP BY o_custkey
          UNION ALL
          SELECT c_custkey AS key, COUNT(1) AS cnt FROM customer WHERE c_custkey > 100 GROUP BY c_custkey
        ) subq1 GROUP BY key ORDER BY key LIMIT 40""",
    ),
    (
        "corr_union_grouped_cast_branches",
        """SELECT key, SUM(value) AS total FROM (
          SELECT CAST(c_nationkey AS INT) AS key, COUNT(1) AS value
          FROM customer WHERE c_custkey < 20 GROUP BY c_nationkey
          UNION ALL
          SELECT COUNT(1) AS key, CAST(c_nationkey AS INT) AS value
          FROM customer WHERE c_custkey > 100 GROUP BY c_nationkey
        ) u GROUP BY key ORDER BY key""",
    ),
    (
        "corr_join_keys_cross_sides_agg",
        """SELECT SUM(tmp.key1) AS s1, SUM(tmp.cnt) AS s2
        FROM (SELECT x.l_orderkey AS key1, COUNT(1) AS cnt
              FROM lineitem x JOIN orders y ON x.l_orderkey = y.o_orderkey
              WHERE x.l_orderkey < 200 AND y.o_orderkey < 200
              GROUP BY x.l_orderkey, x.l_linenumber) tmp""",
    ),
    (
        "corr_three_way_join_then_group_mid_key",
        """SELECT SUM(tmp.key) AS s_key, SUM(tmp.cnt) AS s_cnt
        FROM (SELECT y.n_nationkey AS key, COUNT(1) AS cnt
              FROM region x JOIN nation y ON x.r_regionkey = y.n_regionkey
              JOIN customer z ON y.n_nationkey = z.c_nationkey
              GROUP BY y.n_nationkey) tmp""",
    ),
    (
        "corr_three_way_left_chain_group_last",
        """SELECT SUM(tmp.key) AS s_key, SUM(tmp.cnt) AS s_cnt
        FROM (SELECT z.c_nationkey AS key, COUNT(1) AS cnt
              FROM region x LEFT OUTER JOIN nation y ON x.r_regionkey = y.n_regionkey
              LEFT OUTER JOIN customer z ON y.n_nationkey = z.c_nationkey
              GROUP BY z.c_nationkey) tmp""",
    ),
    (
        "corr_filtered_groupings_joined",
        """SELECT xx.key, yy.key AS ykey, xx.cnt, yy.cnt AS ycnt
        FROM (SELECT c_custkey AS key, COUNT(1) AS cnt FROM customer
              WHERE c_custkey < 120 GROUP BY c_custkey) xx
        JOIN (SELECT o_custkey AS key, COUNT(1) AS cnt FROM orders
              WHERE o_custkey < 200 AND o_custkey > 80 GROUP BY o_custkey) yy
        ON xx.key = yy.key ORDER BY xx.key""",
    ),
    (
        "corr_two_key_groupings_joined_on_both",
        """SELECT xx.key1, xx.key2, yy.cnt AS ycnt, xx.cnt
        FROM (SELECT l_returnflag AS key1, l_linestatus AS key2, COUNT(1) AS cnt
              FROM lineitem WHERE l_orderkey < 120 GROUP BY l_returnflag, l_linestatus) xx
        JOIN (SELECT l_returnflag AS key1, l_linestatus AS key2, COUNT(1) AS cnt
              FROM lineitem WHERE l_orderkey > 80 GROUP BY l_returnflag, l_linestatus) yy
        ON xx.key1 = yy.key1 AND xx.key2 = yy.key2
        ORDER BY xx.key1, xx.key2""",
    ),
    (
        "aj_join_then_group_on_joined_value",
        """SELECT v, COUNT(*) AS n FROM (
          SELECT y.o_orderstatus AS v FROM customer x JOIN orders y
          ON x.c_custkey = y.o_custkey WHERE x.c_custkey < 60) j
        GROUP BY v ORDER BY v""",
    ),
    (
        "aj_self_join_offset_key_chain",
        """SELECT a.n_nationkey, b.n_nationkey AS bk, c.n_nationkey AS ck
        FROM nation a JOIN nation b ON a.n_nationkey + 1 = b.n_nationkey
        JOIN nation c ON b.n_nationkey + 1 = c.n_nationkey
        ORDER BY a.n_nationkey""",
    ),
    (
        "aj_join_condition_or_of_equis",
        """SELECT a.n_nationkey, b.n_nationkey AS bk FROM nation a JOIN nation b
        ON a.n_nationkey = b.n_nationkey OR a.n_nationkey = b.n_regionkey
        WHERE a.n_nationkey < 6 ORDER BY a.n_nationkey, bk""",
    ),
    (
        "aj_join_max_subquery_vs_table",
        """SELECT o_orderkey, o_totalprice FROM orders
        JOIN (SELECT MAX(o_totalprice) AS mx FROM orders) m
        ON o_totalprice = m.mx""",
    ),
    (
        "aj_join_on_substring_expr",
        """SELECT a.n_name, b.n_name AS bn FROM nation a JOIN nation b
        ON substring(a.n_name, 1, 8) = substring(b.n_name, 1, 8)
        WHERE a.n_nationkey < b.n_nationkey ORDER BY a.n_name, bn""",
    ),
    (
        "gbn_two_aggs_different_keys_union",
        """SELECT 'bykey' AS tag, CAST(o_custkey AS STRING) AS k, COUNT(1) AS cnt
        FROM orders WHERE o_custkey < 30 GROUP BY o_custkey
        UNION ALL
        SELECT 'bystatus' AS tag, o_orderstatus AS k, COUNT(1) AS cnt
        FROM orders WHERE o_custkey < 30 GROUP BY o_orderstatus
        ORDER BY tag, k""",
    ),
    (
        "gbn_agg_distinct_plus_plain",
        """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS nd,
               COUNT(o_custkey) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "gbn_group_by_substr_expr",
        """SELECT substring(c_name, 1, 11) AS pfx, COUNT(1) AS cnt
        FROM customer GROUP BY substring(c_name, 1, 11)
        ORDER BY pfx LIMIT 30""",
    ),
    (
        "gbn_group_by_cast_key",
        """SELECT CAST(o_custkey AS STRING) AS k, COUNT(1) AS cnt
        FROM orders WHERE o_custkey < 25 GROUP BY CAST(o_custkey AS STRING)
        ORDER BY k""",
    ),
    (
        "gbn_having_on_distinct_count",
        """SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS np
        FROM orders WHERE o_custkey < 150 GROUP BY o_custkey
        HAVING COUNT(DISTINCT o_orderpriority) >= 3 ORDER BY o_custkey""",
    ),
    (
        "gbn_min_max_same_col_group",
        """SELECT l_linenumber, MIN(l_quantity) AS mn, MAX(l_quantity) AS mx,
               COUNT(1) AS n
        FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""",
    ),
    (
        "mi_shared_scan_three_aggregates",
        """WITH src AS (SELECT * FROM orders WHERE o_orderkey <= 400)
        SELECT 'cnt' AS metric, CAST(COUNT(*) AS DOUBLE) AS v FROM src
        UNION ALL
        SELECT 'sum' AS metric,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v FROM src
        UNION ALL
        SELECT 'keys' AS metric, CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS v FROM src
        ORDER BY metric""",
    ),
    (
        "mi_shared_scan_partitioned_outputs",
        """WITH src AS (SELECT c_custkey, c_nationkey, c_mktsegment FROM customer
                     WHERE c_custkey <= 120)
        SELECT c_mktsegment AS bucket, COUNT(*) AS n FROM src
        WHERE c_nationkey < 12 GROUP BY c_mktsegment
        UNION ALL
        SELECT concat('hi_', c_mktsegment) AS bucket, COUNT(*) AS n FROM src
        WHERE c_nationkey >= 12 GROUP BY c_mktsegment
        ORDER BY bucket""",
    ),
    (
        "corr_ordered_subqueries_joined",
        """SELECT xx.c_custkey, yy.o_orderkey FROM
          (SELECT c_custkey FROM customer ORDER BY c_custkey) xx
        JOIN (SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey) yy
        ON xx.c_custkey = yy.o_custkey
        WHERE xx.c_custkey < 12 ORDER BY xx.c_custkey, yy.o_orderkey""",
    ),
    (
        "corr_limit_subquery_joined",
        """SELECT xx.k, yy.c_name FROM
          (SELECT c_custkey AS k FROM customer ORDER BY c_custkey LIMIT 20) xx
        JOIN customer yy ON xx.k = yy.c_custkey
        ORDER BY xx.k""",
    ),
]

# Sixty-eighth tranche: the union corpus (union1-34.q distinct
# shapes — constant branches from limited scans, aggregate branches
# regrouped above the union, mixed aggregate + raw branches, the
# union22 delta-merge shape, join-branch + row-multiplying branch
# (union26; the LATERAL VIEW branch is spelled as a CROSS JOIN over
# an inline values subquery — one SQL string for both engines),
# type-widening branches, nested unions, a WHERE FALSE branch) plus
# union24's repeated-column selects, semijoin.q's EXISTS/IN variants,
# and the limit family (limit after group-by/join/union, LIMIT 0,
# OFFSET pagination, scalar-subquery LIMIT). All prototyped green on
# both engines at sf0.01 + sf0.001.
QSCRIPTS_R68 = [
    (
        "union3_constants_from_limited_scans",
        """SELECT * FROM (
          SELECT 1 AS id FROM (SELECT * FROM nation LIMIT 1) s1
          UNION ALL
          SELECT 2 AS id FROM (SELECT * FROM nation LIMIT 1) s1
          UNION ALL
          SELECT 3 AS id FROM (SELECT * FROM region LIMIT 1) s2
          UNION ALL
          SELECT 4 AS id FROM (SELECT * FROM region LIMIT 1) s2
        ) a ORDER BY id""",
    ),
    (
        "union5_two_agg_branches_regrouped",
        """SELECT unionsrc.key, COUNT(1) AS cnt FROM (
          SELECT 'tst1' AS key, COUNT(1) AS value FROM orders s1
          UNION ALL
          SELECT 'tst2' AS key, COUNT(1) AS value FROM orders s2
        ) unionsrc GROUP BY unionsrc.key ORDER BY key""",
    ),
    (
        "union7_agg_branch_with_raw_branch",
        """SELECT unionsrc.key, COUNT(1) AS cnt FROM (
          SELECT 'tst1' AS key, CAST(COUNT(1) AS STRING) AS value FROM orders s1
          UNION ALL
          SELECT s2.n_name AS key, CAST(s2.n_nationkey AS STRING) AS value FROM nation s2
        ) unionsrc GROUP BY unionsrc.key ORDER BY key""",
    ),
    (
        "union9_three_agg_branches",
        """SELECT unionsrc.key, COUNT(1) AS cnt FROM (
          SELECT 'tst1' AS key, COUNT(1) AS value FROM customer s1
          UNION ALL
          SELECT 'tst2' AS key, COUNT(1) AS value FROM customer s2
          UNION ALL
          SELECT 'tst3' AS key, COUNT(1) AS value FROM customer s3
        ) unionsrc GROUP BY unionsrc.key ORDER BY key""",
    ),
    (
        "union_mixed_agg_and_two_raw",
        """SELECT unionsrc.key, COUNT(1) AS cnt FROM (
          SELECT 'tst1' AS key, CAST(COUNT(1) AS STRING) AS value FROM region s1
          UNION ALL
          SELECT s2.r_name AS key, CAST(s2.r_regionkey AS STRING) AS value FROM region s2
          UNION ALL
          SELECT s3.r_name AS key, CAST(s3.r_regionkey AS STRING) AS value FROM region s3
        ) unionsrc GROUP BY unionsrc.key ORDER BY key""",
    ),
    (
        "union22_delta_merge_shape",
        """SELECT * FROM (
          SELECT c_custkey AS k1, c_nationkey AS k2 FROM customer
          WHERE c_custkey <= 50
          UNION ALL
          SELECT a.c_custkey AS k1, b.c_nationkey AS k2
          FROM customer a LEFT OUTER JOIN
            (SELECT * FROM customer WHERE c_custkey > 50) b
          ON a.c_custkey = b.c_custkey
          WHERE a.c_custkey > 20 AND a.c_custkey <= 90
        ) subq ORDER BY k1, k2 NULLS FIRST""",
    ),
    (
        "union26_join_branch_lateral_branch",
        """SELECT COUNT(1) AS counts, key FROM (
          SELECT a.n_nationkey AS key
          FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey
          UNION ALL
          SELECT n_nationkey AS key
          FROM nation CROSS JOIN
            (SELECT 1 AS c UNION ALL SELECT 2 UNION ALL SELECT 3) t
        ) a GROUP BY key ORDER BY key""",
    ),
    (
        "union32_bigint_double_widening",
        """SELECT key, CAST(v AS DOUBLE) AS v FROM (
          SELECT n_nationkey AS key, CAST(n_regionkey AS BIGINT) AS v FROM nation
          UNION ALL
          SELECT r_regionkey AS key, CAST(r_regionkey AS DOUBLE) + 0.5 AS v FROM region
        ) u ORDER BY key, v""",
    ),
    (
        "union34_nested_unions_three_deep",
        """SELECT key, COUNT(*) AS n FROM (
          SELECT n_regionkey AS key FROM nation
          UNION ALL
          SELECT * FROM (
            SELECT r_regionkey AS key FROM region
            UNION ALL
            SELECT n_regionkey AS key FROM nation WHERE n_nationkey < 10
          ) inner_u
        ) outer_u GROUP BY key ORDER BY key""",
    ),
    (
        "union_distinct_of_overlapping_branches",
        """SELECT key FROM (
          SELECT n_regionkey AS key FROM nation
          UNION
          SELECT r_regionkey AS key FROM region
        ) u ORDER BY key""",
    ),
    (
        "union_all_then_distinct_count",
        """SELECT COUNT(DISTINCT key) AS nd, COUNT(key) AS n FROM (
          SELECT n_regionkey AS key FROM nation
          UNION ALL
          SELECT r_regionkey AS key FROM region
        ) u""",
    ),
    (
        "union_branch_with_where_false",
        """SELECT key, COUNT(*) AS n FROM (
          SELECT n_regionkey AS key FROM nation
          UNION ALL
          SELECT r_regionkey AS key FROM region WHERE 1 = 0
        ) u GROUP BY key ORDER BY key""",
    ),
    (
        "select_repeated_columns",
        """SELECT n_name, n_regionkey, n_name AS n_name2, n_regionkey AS rk2
        FROM nation ORDER BY n_name""",
    ),
    (
        "select_sextuple_repeats",
        """SELECT r_regionkey AS a, r_regionkey AS b, r_name AS c,
               r_regionkey AS d, r_name AS e, r_name AS f
        FROM region ORDER BY a""",
    ),
    (
        "semijoin_in_with_branch_filter",
        """SELECT n_name FROM nation
        WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name <> 'ASIA')
        ORDER BY n_name""",
    ),
    (
        "semijoin_exists_two_conditions",
        """SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
          AND c.c_custkey < 80
        ORDER BY c_custkey""",
    ),
    (
        "antijoin_not_exists_with_filter",
        """SELECT c_custkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 420000)
          AND c.c_custkey < 120
        ORDER BY c_custkey""",
    ),
    (
        "semijoin_on_expression_key",
        """SELECT n_nationkey FROM nation
        WHERE n_nationkey * 2 IN (SELECT c_nationkey + c_nationkey FROM customer)
        ORDER BY n_nationkey""",
    ),
    (
        "semijoin_then_outer_aggregate",
        """SELECT COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS s FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)""",
    ),
    (
        "limit_after_group_by",
        """SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
        ORDER BY o_custkey LIMIT 12""",
    ),
    (
        "limit_after_join",
        """SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
        ORDER BY n_name LIMIT 7""",
    ),
    (
        "limit_after_union",
        """SELECT key FROM (
          SELECT n_nationkey AS key FROM nation
          UNION ALL
          SELECT r_regionkey AS key FROM region
        ) u ORDER BY key LIMIT 9""",
    ),
    (
        "limit_zero_rows",
        """SELECT COUNT(*) AS n FROM (
          SELECT n_name FROM nation LIMIT 0) t""",
    ),
    (
        "limit_larger_than_input",
        """SELECT r_name FROM region ORDER BY r_name LIMIT 500""",
    ),
    (
        "limit_in_scalar_subquery",
        """SELECT n_name,
               (SELECT r_name FROM region ORDER BY r_regionkey LIMIT 1) AS first_region
        FROM nation WHERE n_nationkey < 5 ORDER BY n_name""",
    ),
    (
        "offset_pagination_filtered",  # offset_limit.q: page 2 of a
        # FILTERED ordering (differentiated r11 — was a literal dup of
        # limit_offset_nation_tail)
        """SELECT n_nationkey, n_name FROM nation WHERE n_regionkey >= 1
           ORDER BY n_nationkey LIMIT 4 OFFSET 4""",
    ),
    (
        "cluster_constant_union_ids",
        """SELECT id FROM (
          SELECT 1 AS id FROM region
          UNION ALL
          SELECT 2 AS id FROM region
        ) a ORDER BY id LIMIT 8""",
    ),
    (
        "groupby_position_and_name_mixed",
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY 1, o_orderpriority
        ORDER BY o_orderstatus, o_orderpriority""",
    ),
    (
        "orderby_alias_of_expression",
        """SELECT n_nationkey + 100 AS shifted FROM nation ORDER BY shifted DESC LIMIT 6""",
    ),
    (
        "orderby_hidden_column_not_projected",
        """SELECT n_name FROM nation ORDER BY n_nationkey DESC LIMIT 5""",
    ),
    (
        "where_in_value_list_literals",
        """SELECT n_name FROM nation WHERE n_regionkey IN (0, 2, 4) ORDER BY n_name""",
    ),
    (
        "nested_case_in_group_key",
        """SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS band, COUNT(*) AS n
        FROM orders GROUP BY CASE WHEN o_totalprice > 300000 THEN 'high'
                                  WHEN o_totalprice > 100000 THEN 'mid'
                                  ELSE 'low' END
        ORDER BY band""",
    ),
]

# Sixty-ninth tranche: grouping-sets edges (groupby_grouping_sets1-6.q
# — explicit set lists incl. the empty set, duplicate sets, singleton
# sets over three keys, expression keys, cube above a grouped
# subquery, join of two cubes on null-safe keys, filter above
# grouping sets, GROUPING() in HAVING; Hive's trailing `GROUP BY a,b
# GROUPING SETS(..)` / `WITH CUBE` respelled as the standard
# GROUP BY GROUPING SETS / CUBE() both engines parse), exact
# decimal arithmetic (division-free: add/multiply/negate/round at
# several scales, wide-precision sums — division rounding diverges
# HALF_UP vs HALF_EVEN and stays out, per operators/_util.py), the
# timestamp/date function remainder (INTERVAL arithmetic — date_sub/
# datediff argument shapes differ across engines), cast boundaries
# (floor-to-bigint since raw double->int truncates in Spark but
# rounds in DuckDB — the divergence is documented here, not papered
# over), and skew/mapjoin result shapes in hint-free spellings.
QSCRIPTS_R69 = [
    (
        "gsets_explicit_list_with_empty",
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem WHERE l_orderkey <= 200
        GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n""",
    ),
    (
        "gsets_partial_list_no_empty",
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem WHERE l_orderkey <= 200
        GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))
        ORDER BY l_returnflag, l_linestatus NULLS FIRST, n""",
    ),
    (
        "gsets_duplicate_set_listed_twice",
        """SELECT o_orderstatus, COUNT(*) AS n FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus))
        ORDER BY o_orderstatus, n""",
    ),
    (
        "gsets_singleton_sets_three_keys",
        """SELECT o_orderstatus, o_orderpriority, l_shipstatus, COUNT(*) AS n FROM
          (SELECT o_orderstatus, o_orderpriority,
                  CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS l_shipstatus
           FROM orders WHERE o_orderkey <= 300) t
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (l_shipstatus))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST,
                 l_shipstatus NULLS FIRST, n""",
    ),
    (
        "gsets_on_expression_key",
        """SELECT n_nationkey + n_regionkey AS ab, COUNT(*) AS n
        FROM nation GROUP BY GROUPING SETS ((n_nationkey + n_regionkey))
        ORDER BY ab""",
    ),
    (
        "gsets_cube_over_grouped_subquery",
        """SELECT a, b, COUNT(*) AS n FROM
          (SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(1) AS c
           FROM orders GROUP BY o_orderstatus, o_orderpriority) subq1
        GROUP BY CUBE(a, b)
        ORDER BY a NULLS FIRST, b NULLS FIRST, n""",
    ),
    (
        "gsets_join_of_two_cubes",
        """SELECT subq1.a, subq1.n AS n1, subq2.n AS n2 FROM
          (SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*) AS n
           FROM orders WHERE o_orderkey < 300 GROUP BY CUBE(o_orderstatus, o_orderpriority)) subq1
        JOIN
          (SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*) AS n
           FROM orders WHERE o_orderkey < 300 GROUP BY CUBE(o_orderstatus, o_orderpriority)) subq2
        ON subq1.a = subq2.a AND subq1.b IS NOT DISTINCT FROM subq2.b
        WHERE subq1.a IS NOT NULL
        ORDER BY subq1.a, subq1.b NULLS FIRST, n1, n2""",
    ),
    (
        "gsets_filter_above_grouping_sets",
        """SELECT a, b FROM
          (SELECT o_custkey AS a, o_orderstatus AS b FROM orders
           WHERE o_custkey < 30
           GROUP BY GROUPING SETS ((o_custkey, o_orderstatus), (o_custkey))) res
        WHERE res.a = 5 ORDER BY a, b NULLS FIRST""",
    ),
    (
        "gsets_cube_sum_of_expression",
        """SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity + l_linenumber AS DECIMAL(18,2))) AS DOUBLE) AS s
        FROM lineitem WHERE l_orderkey <= 150
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, s""",
    ),
    (
        "gsets_rollup_three_levels",
        """SELECT r_name, n_name, COUNT(*) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, n""",
    ),
    (
        "gsets_grouping_id_filter",
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
        WHERE l_orderkey <= 200
        GROUP BY CUBE(l_returnflag, l_linestatus)
        HAVING GROUPING(l_linestatus) = 1
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n""",
    ),
    (
        "dec_add_mul_exact_scale",
        """SELECT l_orderkey,
               CAST(CAST(l_quantity AS DECIMAL(12,2)) + CAST(0.25 AS DECIMAL(12,2)) AS DOUBLE) AS q_plus,
               CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(3 AS DECIMAL(4,0)) AS DOUBLE) AS q_times
        FROM lineitem WHERE l_orderkey <= 20 ORDER BY l_orderkey, q_plus""",
    ),
    (
        "dec_sum_wide_precision",
        """SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
        FROM orders""",
    ),
    (
        "dec_negative_and_abs",
        """SELECT o_orderkey,
               CAST(-CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS neg,
               CAST(abs(-CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS back
        FROM orders WHERE o_orderkey <= 15 ORDER BY o_orderkey""",
    ),
    (
        "dec_round_and_truncate_scales",
        """SELECT o_orderkey,
               round(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS r1,
               round(CAST(o_totalprice AS DECIMAL(18,2)), 0) AS r0,
               round(CAST(o_totalprice AS DECIMAL(18,2)), -2) AS rneg
        FROM orders WHERE o_orderkey <= 15 ORDER BY o_orderkey""",
    ),
    (
        "dec_comparison_across_scales",
        """SELECT COUNT(*) AS n FROM orders
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) > CAST(100000.50 AS DECIMAL(10,2))""",
    ),
    (
        "dec_min_max_group",
        """SELECT o_orderstatus,
               CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mn,
               CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mx
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    ),
    (
        "ts_extract_epoch_parts_roundtrip",
        """SELECT event_id,
               year(ts) AS y, month(ts) AS m, day(ts) AS d,
               hour(ts) AS h, minute(ts) AS mi, second(ts) AS s
        FROM events WHERE event_id <= 20 ORDER BY event_id""",
    ),
    (
        "ts_date_add_sub_chain",
        """SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL '30' DAY AS DATE) AS plus30,
               CAST(CAST(o_orderdate AS DATE) - INTERVAL '30' DAY AS DATE) AS minus30
        FROM orders WHERE o_orderkey <= 15 ORDER BY o_orderkey""",
    ),
    (
        "ts_interval_window_filter",
        """SELECT COUNT(*) AS n_old, COUNT(CASE WHEN late THEN 1 END) AS n_late FROM (
          SELECT o_orderdate + INTERVAL '90' DAY < TIMESTAMP '2023-06-01 00:00:00' AS late
          FROM orders WHERE o_orderkey <= 400) t""",
    ),
    (
        "ts_last_day_and_trunc",
        """SELECT DISTINCT CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS som
        FROM orders WHERE o_orderkey <= 100 ORDER BY eom""",
    ),
    (
        "ts_dayofweek_consistency",
        """SELECT dayofmonth(CAST(o_orderdate AS DATE)) AS dom, COUNT(*) AS n
        FROM orders WHERE o_orderkey <= 300
        GROUP BY dayofmonth(CAST(o_orderdate AS DATE)) ORDER BY dom""",
    ),
    (
        "ts_make_date_roundtrip",
        """SELECT make_date(2024, n_nationkey % 12 + 1, n_nationkey + 1) AS d
        FROM nation WHERE n_nationkey < 12 ORDER BY d""",
    ),
    (
        "cast_floor_double_to_bigint",
        """SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS floored
        FROM orders WHERE o_orderkey <= 15 ORDER BY o_orderkey""",
    ),
    (
        "cast_string_roundtrip_double",
        """SELECT o_orderkey,
               CAST(CAST(o_totalprice AS STRING) AS DOUBLE) AS roundtrip
        FROM orders WHERE o_orderkey <= 15 ORDER BY o_orderkey""",
    ),
    (
        "cast_bool_int_string_chain",
        """SELECT n_nationkey,
               CAST(CAST(n_nationkey > 10 AS INT) AS STRING) AS b_str
        FROM nation ORDER BY n_nationkey""",
    ),
    (
        "cast_string_date_literal_compare",
        """SELECT COUNT(*) AS n FROM orders
        WHERE CAST(o_orderdate AS DATE) >= CAST('2023-03-01' AS DATE)
          AND o_orderkey <= 500""",
    ),
    (
        "skew_heavy_key_join_counts",
        """SELECT k, COUNT(*) AS n FROM (
          SELECT CASE WHEN l_orderkey % 10 = 0 THEN 0 ELSE l_orderkey END AS k
          FROM lineitem WHERE l_orderkey <= 300) a
        JOIN (SELECT 0 AS k UNION ALL SELECT 5 UNION ALL SELECT 11) keys
        USING (k) GROUP BY k ORDER BY k""",
    ),
    (
        "mapjoin_small_dim_projected_only",
        """SELECT r_name, COUNT(*) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'EUROPE') GROUP BY r_name ORDER BY r_name""",
    ),
    (
        "join_same_dim_twice_different_roles",
        """SELECT a.r_name AS src_region, b.r_name AS dst_region, COUNT(*) AS n
        FROM nation n1 JOIN region a ON n1.n_regionkey = a.r_regionkey
        JOIN nation n2 ON n1.n_nationkey = (n2.n_nationkey + 5) % 25
        JOIN region b ON n2.n_regionkey = b.r_regionkey
        GROUP BY a.r_name, b.r_name ORDER BY src_region, dst_region LIMIT 20""",
    ),
]

# Seventieth tranche: grammar/optimizer stragglers — select_as_
# omitted.q (alias without AS), parenthesis_star_by.q, constant
# folding (constprog*/fold_case), having2.q's multi-aggregate and
# unprojected-aggregate HAVING, mergejoins.q equi-chains, router
# outer-join shapes, subquery_views.q as CTE chains (a persistent
# view cannot be created identically on both engines mid-test; the
# CTE spelling exercises the same nested-view resolution), nonmr_
# fetch.q fetch-task shapes, and conditional/string udf positives
# (split_part instead of split()[i] — array indexing is 0-based in
# Spark, 1-based in DuckDB). quote1/quote2.q's quoted identifiers
# are a documented drop here: Spark backticks vs DuckDB double
# quotes cannot share one SQL string (the engine-side backtick
# behavior is covered by the suite's own tests).
QSCRIPTS_R70 = [
    (
        "alias_without_as_keyword",
        """SELECT n_name the_name, n_regionkey rk FROM nation
        ORDER BY the_name LIMIT 10""",
    ),
    (
        "parenthesized_order_by_list",
        """SELECT c_custkey, c_nationkey FROM customer
        WHERE c_custkey <= 30 ORDER BY (c_nationkey), (c_custkey)""",
    ),
    (
        "constprog_arith_folds_in_filter",
        """SELECT n_nationkey FROM nation
        WHERE n_nationkey = 10 + 5 - 5 + 2 ORDER BY n_nationkey""",
    ),
    (
        "fold_case_constant_condition",
        """SELECT n_name,
               CASE WHEN 1 = 1 THEN 'always' ELSE 'never' END AS tag
        FROM nation ORDER BY n_name LIMIT 8""",
    ),
    (
        "fold_between_constants",
        """SELECT COUNT(*) AS n FROM orders
        WHERE 5 BETWEEN 1 AND 10 AND o_orderkey <= 100""",
    ),
    (
        "constprog_string_concat_fold",
        """SELECT n_nationkey FROM nation
        WHERE n_name = concat('NATION', '_', '3')""",
    ),
    (
        "having_over_two_aggregates",
        """SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
               COUNT(*) AS n
        FROM orders WHERE o_custkey < 200 GROUP BY o_custkey
        HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 1000000 AND COUNT(*) >= 8
        ORDER BY o_custkey""",
    ),
    (
        "having_references_unprojected_agg",
        """SELECT o_orderstatus FROM orders GROUP BY o_orderstatus
        HAVING MIN(o_orderkey) > 0 AND MAX(o_orderkey) > 100
        ORDER BY o_orderstatus""",
    ),
    (
        "mergejoin_four_way_same_key",
        """SELECT COUNT(*) AS n FROM
          nation a JOIN nation b ON a.n_nationkey = b.n_nationkey
          JOIN nation c ON b.n_nationkey = c.n_nationkey
          JOIN nation d ON c.n_nationkey = d.n_nationkey""",
    ),
    (
        "mergejoin_mixed_inner_then_outer_chain",
        """SELECT a.n_nationkey, d.r_name
        FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey
        LEFT OUTER JOIN nation c ON b.n_nationkey = c.n_nationkey + 30
        JOIN region d ON a.n_regionkey = d.r_regionkey
        ORDER BY a.n_nationkey""",
    ),
    (
        "router_right_join_small_left",
        """SELECT r_name, n_name FROM region
        RIGHT OUTER JOIN nation ON r_regionkey = n_regionkey AND r_regionkey > 1
        ORDER BY n_name""",
    ),
    (
        "view_shaped_cte_chain",
        """WITH v1 AS (SELECT n_nationkey, n_name, n_regionkey FROM nation
                    WHERE n_regionkey > 0),
             v2 AS (SELECT v1.n_name, r_name FROM v1
                    JOIN region ON v1.n_regionkey = r_regionkey
                    WHERE v1.n_nationkey > 3)
        SELECT r_name, COUNT(*) AS n FROM v2 GROUP BY r_name ORDER BY r_name""",
    ),
    (
        "cte_referenced_twice_in_join",
        """WITH base AS (SELECT o_custkey, COUNT(*) AS n FROM orders
                      WHERE o_custkey < 100 GROUP BY o_custkey)
        SELECT a.o_custkey, a.n + b.n AS doubled FROM base a
        JOIN base b ON a.o_custkey = b.o_custkey ORDER BY a.o_custkey""",
    ),
    (
        "multigroupby_join_two_aggregations",
        """SELECT s.o_orderstatus, s.n AS by_status, p.n AS by_prio
        FROM (SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus) s
        JOIN (SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority) p
        ON s.n > p.n
        ORDER BY s.o_orderstatus, p.n LIMIT 20""",
    ),
    (
        "fetch_only_projection_no_filter",
        """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""",
    ),
    (
        "fetch_limit_without_order",
        """SELECT COUNT(*) AS n FROM (SELECT n_name FROM nation LIMIT 100) t""",
    ),
    (
        "nested_if_else_chain",
        """SELECT n_nationkey,
               IF(n_regionkey = 0, 'africa',
                  IF(n_regionkey = 1, 'america',
                     IF(n_regionkey = 2, 'asia', 'other'))) AS region_tag
        FROM nation ORDER BY n_nationkey""",
    ),
    (
        "coalesce_cascade_with_nullif",
        """SELECT n_nationkey,
               coalesce(nullif(n_name, 'NATION_0'), 'ZERO') AS resolved
        FROM nation ORDER BY n_nationkey LIMIT 12""",
    ),
    (
        "concat_ws_skips_nulls",
        """SELECT concat_ws('-', n_name,
                         CASE WHEN n_nationkey % 2 = 0 THEN NULL ELSE 'odd' END,
                         CAST(n_regionkey AS STRING)) AS joined
        FROM nation ORDER BY joined""",
    ),
    (
        "split_and_index_string",
        """SELECT n_name, split_part(n_name, '_', 2) AS suffix
        FROM nation ORDER BY n_name LIMIT 10""",
    ),
    (
        "lpad_rpad_fixed_width",
        """SELECT lpad(CAST(n_nationkey AS STRING), 4, '0') AS padded,
               rpad(n_name, 12, '.') AS dotted
        FROM nation ORDER BY padded""",
    ),
    (
        "ascii_and_chr_roundtrip",
        """SELECT n_nationkey, ascii(substring(n_name, 1, 1)) AS first_code,
               chr(65 + n_nationkey % 26) AS letter
        FROM nation ORDER BY n_nationkey""",
    ),
]

# --- round 11, tranche 71: the last portable positive families
# (r10 verdict task 4) — vectorization_[0-17] expression/aggregate
# shapes (reference clientpositive/vectorization_0.q, _7.q, _12.q,
# _13.q, vector_decimal_aggregate.q — the VALUE semantics; the
# vectorized execution itself is Tungsten's job here) plus the
# metadataonly1.q / metadata_only_queries.q / stats_only_null.q
# aggregate-over-metadata shapes not already covered by the
# metadata_only.q golden. Respellings: alltypesorc columns map onto
# lineitem/orders/nation numerics; double SUMs go through DECIMAL
# (oracle float canon); ORDER BY carries unique tiebreakers.
# Documented drops: timestamp<->numeric comparisons (Hive-only
# coercion, no Spark/DuckDB spelling); simple-vs-searched CASE,
# coalesce chains, NOT BETWEEN, count-reaggregation, the stats1.q
# union-insert shape and count-distinct-partition shapes (already
# pinned in earlier tranches / the metadata_only golden);
# stddev/variance family (stat_stddev_var_rounded,
# variance_moments_exact); compute-query-using-stats count answers
# (Spark never answers COUNT(*) from stats — engine divergence,
# ANALYZE itself pinned in tests/test_ddl_writes.py).
QSCRIPTS_R71 = [
    (
        "vec0_minmaxcount_ordered",  # vectorization_0.q: MIN/MAX/
        # COUNT(col)/COUNT(*) ordered by the aggregate alias
        """SELECT MIN(l_linenumber) AS c1, MAX(l_linenumber) AS mx,
               COUNT(l_linenumber) AS c, COUNT(*) AS n
        FROM lineitem ORDER BY c1""",
    ),
    (
        "vec0_nested_neg_agg_arith",  # vectorization_0.q tail: nested
        # negation arithmetic over aggregates, integer-exact
        """SELECT CAST(SUM(l_linenumber) AS BIGINT) AS s,
               -(CAST(SUM(l_linenumber) AS BIGINT)) AS negs,
               -6432 + CAST(SUM(l_linenumber) AS BIGINT) AS shifted,
               -(-6432 + CAST(SUM(l_linenumber) AS BIGINT)) AS negshift,
               (-(-6432 + CAST(SUM(l_linenumber) AS BIGINT)))
                 + (-6432 + CAST(SUM(l_linenumber) AS BIGINT)) AS zerosum
        FROM lineitem""",
    ),
    (
        "vec0_agg_self_division",  # vectorization_0.q: division of
        # identical aggregate terms (x/x, -x/x)
        """SELECT CAST(SUM(l_linenumber) AS DOUBLE)
                 / CAST(SUM(l_linenumber) AS DOUBLE) AS one,
               CAST(-SUM(l_linenumber) AS DOUBLE)
                 / CAST(SUM(l_linenumber) AS DOUBLE) AS negone
        FROM lineitem""",
    ),
    (
        "vec0_mod_between_aggs",  # vectorization_0.q: modulo BETWEEN
        # aggregates (VAR_SAMP % STDDEV_POP respelled integer-exact)
        """SELECT CAST(SUM(l_linenumber) AS BIGINT) % COUNT(*) AS m,
               MOD(CAST(MAX(l_orderkey) AS BIGINT), MIN(l_linenumber) + 1) AS m2
        FROM lineitem""",
    ),
    (
        "vec0_compound_or_and_predicate",  # vectorization_0.q WHERE:
        # OR/AND nest mixing LIKE, cross-type !=/<, reversed operands
        """SELECT COUNT(*) AS n FROM lineitem
        WHERE ((l_returnflag LIKE '%R%')
               OR ((79.553 != l_extendedprice)
                   OR (l_orderkey < l_extendedprice)))
           OR ((l_linenumber >= l_suppkey)
               AND ((l_linestatus = 'F') AND (3569 = l_linenumber)))""",
    ),
    (
        "vec7_projection_arith_limit",  # vectorization_7.q: projection
        # arithmetic pack — self-add, negative-literal modulo, nested
        # negation, self-modulo — under ORDER BY + LIMIT
        """SELECT l_orderkey, l_linenumber,
               (l_orderkey + l_orderkey) AS dbl,
               (l_linenumber % -257) AS m257,
               (-(l_linenumber)) AS neg,
               ((-(l_linenumber)) + 17) AS shift17,
               (l_orderkey * (-(l_linenumber))) AS prod,
               ((-(l_linenumber)) % l_linenumber) AS selfmod
        FROM lineitem WHERE l_linenumber != 0
        ORDER BY l_orderkey, l_linenumber LIMIT 25""",
    ),
    (
        "vec13_groupby_bool_expr_keys",  # vectorization_13.q: boolean
        # EXPRESSION as a grouping key beside a column key
        """SELECT (l_quantity > 25) AS big, l_returnflag,
               COUNT(*) AS n, MIN(l_linenumber) AS mn
        FROM lineitem GROUP BY (l_quantity > 25), l_returnflag
        ORDER BY big, l_returnflag""",
    ),
    (
        "vec13_group_col_agg_mix",  # vectorization_13.q: expressions
        # mixing the GROUP key with aggregates ((-col) + MAX, SUM * mix)
        """SELECT l_linenumber,
               (-(l_linenumber)) + MAX(l_suppkey) AS mixshift,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 * ((-(l_linenumber)) + MAX(l_suppkey)) AS mixprod
        FROM lineitem GROUP BY l_linenumber
        ORDER BY l_linenumber LIMIT 7""",
    ),
    (
        "vec12_groupby_agg_arithmetic",  # vectorization_12.q: per-group
        # arithmetic between aggregates (SUM * COUNT, negated MIN)
        """SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(l_linenumber) AS BIGINT) * COUNT(*) AS prod,
               -(MIN(l_linenumber)) AS negmin
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ),
    (
        "vdec_decimal_agg_family",  # vector_decimal_aggregate.q:
        # COUNT/MAX/MIN/SUM over a cast decimal, HAVING COUNT > 1
        """SELECT l_returnflag, COUNT(d) AS cnt, MAX(d) AS mx, MIN(d) AS mn,
               CAST(SUM(d) AS DECIMAL(25,2)) AS sm
        FROM (SELECT l_returnflag,
                     CAST(l_extendedprice AS DECIMAL(14,2)) AS d
              FROM lineitem) t
        GROUP BY l_returnflag HAVING COUNT(d) > 1 ORDER BY l_returnflag""",
    ),
    (
        "mo1_allnull_subset_aggs",  # metadataonly1.q / stats_only_null.q:
        # MAX / COUNT DISTINCT / COUNT over an all-NULL derived column
        """SELECT MAX(sub) AS m, COUNT(DISTINCT sub) AS cd, COUNT(sub) AS c
        FROM (SELECT CASE WHEN n_nationkey > 900 THEN n_name END AS sub
              FROM nation) t""",
    ),
    (
        "mo_distinct_then_minmax",  # metadataonly1.q srcpart shape:
        # MIN/MAX over the DISTINCT set of a date-typed column
        """SELECT MIN(d) AS mn, MAX(d) AS mx, COUNT(*) AS n
        FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders) t""",
    ),
    (
        "moq_sum_constants",  # metadata_only_queries.q: COUNT(*) beside
        # SUM(1), SUM(decimal constant), COUNT(1), COUNT(col)
        """SELECT COUNT(*) AS n, CAST(SUM(1) AS BIGINT) AS s1,
               CAST(SUM(CAST('0.2' AS DECIMAL(3,1))) AS DOUBLE) AS s02,
               COUNT(1) AS c1, COUNT(n_name) AS cs
        FROM nation""",
    ),
    (
        "vrgd_decimal_group_key",  # vector_reduce_groupby_decimal.q:
        # a DECIMAL-typed expression as the grouping key
        """SELECT d, COUNT(*) AS n, CAST(SUM(l_linenumber) AS BIGINT) AS s
        FROM (SELECT CAST(l_discount AS DECIMAL(4,2)) AS d, l_linenumber
              FROM lineitem) t
        GROUP BY d ORDER BY d""",
    ),
    (
        "vdu_decimal_division_double",  # vector_decimal_udf.q: decimal
        # division respelled through DOUBLE (result scale rules differ
        # between engines; IEEE division is the shared core)
        """SELECT l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(14,2)) AS DOUBLE)
                 / CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS unit
        FROM lineitem WHERE l_quantity > 0
        ORDER BY l_orderkey, l_linenumber LIMIT 10""",
    ),
    (
        "vcc_agg_of_cast_constants",  # vector_cast_constant.q: AVG/SUM/
        # MAX over CAST constants, per group
        """SELECT n_regionkey,
               CAST(AVG(CAST(50 AS BIGINT)) AS DOUBLE) AS avg_b,
               CAST(SUM(CAST('4.7' AS DECIMAL(3,1))) AS DOUBLE) AS sum_d,
               MAX(CAST('x' AS STRING)) AS mx
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    ),
]

# CORPUS CLOSURE NOTE (r11): the positive family is declared CLOSED by
# the same probe-dryness criterion the negative family used (≥80%
# duplicates in a 20-candidate probe). The r11 probe examined 20
# remaining clientpositive shapes across vector*/orc*/stats*/metadata*:
# 17 collapsed onto already-pinned entries, goldens, or other suites
# (IF-expr, string concat ||, NOT BETWEEN/IN, date/timestamp funcs,
# CHAR/VARCHAR padding [test_ddl_surface], ANALYZE autogather
# [test_ddl_writes], metadataOnlyOptimizer [metadata_only.q golden],
# orc* format DDL [test_formats_and_io], decimal trailing/precision
# render shapes, count-reaggregation, simple-vs-searched CASE,
# coalesce chains) or have no shared Spark+DuckDB spelling (elt,
# unix_timestamp, timestamp<->numeric coercion) — 85% dry. The 3
# genuinely-new shapes were landed above (vrgd_/vdu_/vcc_). Remaining
# un-mined scripts are engine-specific (vectorized execution plumbing,
# MR layout, stats-answered counts).

ALL_QSCRIPTS = [
    (n, s)
    for tranche in sorted(
        (k for k in dir() if k == "QSCRIPTS" or k.startswith("QSCRIPTS_R")),
        key=lambda k: int(k.rsplit("R", 1)[-1]) if "_R" in k else 1,
    )
    for n, s in globals()[tranche]
]

# Corpus ids must be UNIQUE: a duplicated name blurs source-script
# traceability and pytest would silently suffix the test ids (r6
# verdict finding — 17 names were duplicated across tranches). A
# module-level assert fails collection itself, so this cannot regress.
_counts = __import__("collections").Counter(n for n, _ in ALL_QSCRIPTS)
_dupes = sorted(n for n, c in _counts.items() if c > 1)
assert not _dupes, f"duplicated q-script names: {_dupes}"

# ...and so must the SQL TEXTS (whitespace-normalized): two entries
# running the same statement under different names are padding, not
# coverage (r10 verdict finding #2 — six literal pairs had slipped
# through the name-only check; differentiated r11).
_norm = __import__("collections").Counter(
    " ".join(s.split()).lower() for _, s in ALL_QSCRIPTS
)
_sql_dupes = sorted(
    n for n, s in ALL_QSCRIPTS if _norm[" ".join(s.split()).lower()] > 1
)
assert not _sql_dupes, f"duplicate SQL texts across entries: {_sql_dupes}"


@pytest.mark.parametrize("name,sql", ALL_QSCRIPTS)
def test_qscript(spark, sf_dir, name, sql):
    tables(spark, sf_dir)
    s_cols, s_rows = spark_rows(spark.sql(sql))
    con = duckdb_connection(sf_dir)
    try:
        d_cols, d_rows = duckdb_rows(con, sql)
    finally:
        con.close()
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert s_rows, f"{name}: empty result — vacuous-filter trap"
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
