# Round-9 q-corpus candidates, batch 1: the r8 verdict's named
# families — union_remove_*, windowing_expressions,
# windowing_multipartitioning, join_filters/join_nulls remainder,
# limit_pushdown*. Prototype-first per the workflow; survivors go to
# QSCRIPTS_R59.

CANDIDATES = [
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
