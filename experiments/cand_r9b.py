# Round-9 q-corpus candidates, batch 2: set-operation tails
# (intersect/except ALL forms), subquery long tail (exists-having,
# scalar-in-select, correlated agg), string/date udf_* shapes that are
# portable SQL, decimal arithmetic precision, ORDER BY null-placement
# combos, grouping-sets edges, count.q variants.

CANDIDATES = [
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
        "str_ascii_chr_roundtrip",
        """SELECT n_nationkey, ascii(n_name) AS first_code,
                  chr(ascii(n_name)) AS first_char
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
