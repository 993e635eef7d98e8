# Round-9 q-corpus candidates, batch 4: groupby positional/alias
# edges, view-less CTE compositions, order-by expressions, IN-list /
# BETWEEN boundaries, scalar conditional combos, correlated-subquery
# variants, windowing frame boundaries, multi-level aggregation.

CANDIDATES = [
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
