# Round-9 q-corpus candidates, batch 3: ppd_* outer-join pushdown
# remainder, multi-way join chains (auto_sortmerge/join ordering
# lineage), regexp/LIKE pattern shapes, events-table time analytics,
# statistical aggregates, bit ops, type-coercion unions, self joins.

CANDIDATES = [
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
