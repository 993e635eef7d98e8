"""TPC-H-shaped query suite beyond the q1/q3/q5/q18 bench set —
the reference's own fixture domain (its `part`/`lineitem` tables are
TPC-H-shaped, q_test_init.sql:269-302). Each query exercises a
distinct composite plan pattern; columns are adapted to the driver's
narrower schemas (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.operators._util import O_DISC_PRICE, disc_price, dsum, o_dsum
from amplab_hive_spark.registry import register


from amplab_hive_spark.operators._util import run_sql as _sql  # noqa: E402


_Q2 = """
SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_acctbal = (
    SELECT MAX(s2.s_acctbal) FROM supplier s2
    WHERE s2.s_nationkey = s.s_nationkey
)
ORDER BY s.s_suppkey
"""


@register("q2_max_per_group_subquery", tags=("subquery", "join"), oracle=_Q2)
def q2_max_per_group_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MAX subquery selecting each
    nation's top-balance supplier(s). Catalyst rewrites the
    correlated scalar into an aggregate + join — no per-row
    re-execution."""
    return _sql(spark, sf_dir, _Q2)


# q11's HAVING threshold is RELATIVE (2x the average part share),
# not TPC-H's absolute fraction: the driver's SFs span 100x, and an
# absolute fraction that selects rows at sf0.01 selects none at
# sf0.1 (verified: the 0.001 form returned 0 rows there). Relative
# thresholds keep every SF's result non-vacuous.


_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_order_priority_exists", tags=("subquery", "semi", "agg"), oracle=_Q4)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS with a non-key correlated predicate
    (l_shipdate > o_orderdate) → semi join carrying an extra join
    condition."""
    return _sql(spark, sf_dir, _Q4)


_Q7 = f"""
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,2))) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q7_nation_volume_shipping", tags=("join", "agg"), oracle=_Q7)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: 6-table join with a disjunctive cross-nation
    predicate, grouped by derived year."""
    return _sql(spark, sf_dir, _Q7)


_Q10 = f"""
SELECT c_custkey, c_name, {o_dsum(O_DISC_PRICE)} AS revenue, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", tags=("join", "agg", "topk"), oracle=_Q10)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue ranking — 4-way join,
    high-cardinality group key, top-20."""
    return _sql(spark, sf_dir, _Q10)


_Q14 = f"""
SELECT 100.0 * {o_dsum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {O_DISC_PRICE} ELSE CAST(0 AS DECIMAL(24,4)) END")}
             / {o_dsum(O_DISC_PRICE)} AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


@register("q14_promo_effect", tags=("join", "agg", "conditional"), oracle=_Q14)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation (CASE inside SUM) over a
    broadcast join; single-row result. Decimal ratio → double at the
    end only."""
    return _sql(spark, sf_dir, _Q14)


_Q19 = f"""
SELECT {o_dsum(O_DISC_PRICE)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 50)
"""


@register("q19_disjunctive_predicates", tags=("join", "filter"), oracle=_Q19)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three-branch disjunction mixing both join sides'
    columns — the classic test that OR predicates still evaluate
    inside the join instead of exploding into a cross product."""
    return _sql(spark, sf_dir, _Q19)


_Q22 = """
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM (
  SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) / COUNT(*)
      FROM customer WHERE c_acctbal > 0.00
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""


@register("q22_global_sales_opportunity", tags=("subquery", "anti", "agg"), oracle=_Q22)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: scalar subquery threshold + anti join (customers
    above mean balance with no orders), grouped by derived code."""
    return _sql(spark, sf_dir, _Q22)


@register(
    "docs_with_embeddings_join",
    tags=("llm", "join", "multimodal"),
    oracle="""
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(len(e.embedding) AS BIGINT)) AS BIGINT) AS total_dims,
       MIN(e.label) AS min_label, MAX(e.label) AS max_label
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY d.lang
ORDER BY d.lang
""",
)
def docs_with_embeddings_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal join: text table ⋈ embedding table on id — the
    canonical shape of a multimodal training-data pipeline (text +
    vector features side by side)."""
    t = tables(spark, sf_dir)
    return (
        t.documents.join(t.embeddings, F.col("doc_id") == F.col("vec_id"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("embedding").cast("bigint")).alias("total_dims"),
            F.min("label").alias("min_label"),
            F.max("label").alias("max_label"),
        )
        .orderBy("lang")
    )


# -- The remaining TPC-H shapes (q6..q21), adapted to the driver's
# narrower schema: no partsupp table and no l_shipmode /
# l_commitdate / l_receiptdate columns, so q9/q11/q16/q20 source the
# part-supplier relation from lineitem and the "late" predicate is
# l_shipdate > o_orderdate. Plan shapes are preserved.

_Q6 = """
SELECT CAST(SUM(CAST((CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(6,2))) AS DECIMAL(38,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", tags=("filter", "agg"), bench=True, oracle=_Q6)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the canonical pushdown
    benchmark. All three predicates reach the parquet scan; no
    shuffle except the single-row final agg."""
    return _sql(spark, sf_dir, _Q6)


_Q8 = """
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,2))) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", tags=("join", "agg", "conditional"), bench=True, oracle=_Q8)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: 8-table join (nation twice) with a conditional
    share ratio per year. Every dimension is broadcast-sized; the
    only shuffle is lineitem⋈orders."""
    return _sql(spark, sf_dir, _Q8)


_Q9 = """
SELECT nation, o_year, CAST(SUM(CAST(amount AS DECIMAL(38,4))) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,2))) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("q9_product_type_profit", tags=("join", "agg"), oracle=_Q9)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: profit = discounted price; no partsupp
    supplycost in this schema): substring-LIKE part filter driving a
    5-table join, grouped by nation and derived year."""
    return _sql(spark, sf_dir, _Q9)


# the shared decimal revenue pipeline — identical to o_dsum(O_DISC_PRICE),
# spelled through the helpers so a scale change in _util propagates here
_LINE_VALUE = o_dsum(O_DISC_PRICE)

_Q11 = f"""
SELECT l_partkey AS p_key, {_LINE_VALUE} AS part_value
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
GROUP BY l_partkey
HAVING {_LINE_VALUE} > (
    SELECT {_LINE_VALUE} * 2.0 / COUNT(DISTINCT l_partkey)
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
)
ORDER BY part_value DESC, p_key
"""


@register("q11_important_stock", tags=("subquery", "agg", "having"), oracle=_Q11)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: value = lineitem revenue; no partsupp in
    this schema): per-part value vs an uncorrelated scalar-subquery
    fraction of the national total — group-agg HAVING against a
    global aggregate."""
    return _sql(spark, sf_dir, _Q11)


_Q12 = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('A', 'N')
  AND l_shipdate > o_orderdate
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("q12_shipmode_priority", tags=("join", "agg", "conditional"), oracle=_Q12)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted: class column = l_returnflag, late =
    shipped after order date; no l_shipmode/commitdate in this
    schema): pivot-style CASE counts over a non-equi-filtered
    join."""
    return _sql(spark, sf_dir, _Q12)


_Q13 = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_customer_distribution", tags=("outer-join", "agg"), oracle=_Q13)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left outer join with an extra ON predicate, then a
    two-level aggregation (count per customer, histogram of
    counts). COUNT(col) null semantics over the outer side."""
    return _sql(spark, sf_dir, _Q13)


_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {_LINE_VALUE} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", tags=("cte", "subquery", "agg"), oracle=_Q15)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: a CTE referenced twice (join input + MAX scalar
    subquery) — the view-reuse shape. Equality on exact-decimal
    revenue is sound because both sides derive from the same
    associative decimal sum."""
    return _sql(spark, sf_dir, _Q15)


_Q16 = """
SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_parts_supplier_counts", tags=("anti", "distinct-agg"), oracle=_Q16)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: part-supplier relation from lineitem;
    "complaint" suppliers = negative balance): NOT IN anti join
    feeding a COUNT(DISTINCT) over three group columns."""
    return _sql(spark, sf_dir, _Q16)


_Q17 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#2' AND p_type = 'SMALL'
  AND l_quantity < (
      SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
      FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@register("q17_small_quantity_revenue", tags=("subquery", "agg"), oracle=_Q17)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar AVG threshold per part —
    Catalyst rewrites to an aggregate-then-join, one pass over
    lineitem per side instead of per-row re-execution."""
    return _sql(spark, sf_dir, _Q17)


_Q20 = """
SELECT s_name, s_suppkey
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 50.0
  )
ORDER BY s_suppkey
"""


@register("q20_potential_promotion", tags=("subquery", "semi", "having"), oracle=_Q20)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: availability from lineitem; no partsupp
    in this schema): IN-within-IN — a semi join whose inner side is
    itself a grouped HAVING over a semi-joined scan."""
    return _sql(spark, sf_dir, _Q20)


_Q21 = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
JOIN nation    ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate
  AND n_name = 'NATION_4'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o_orderdate
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@register("q21_suppliers_kept_waiting", tags=("semi", "anti", "self-join"), bench=True, oracle=_Q21)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: late = shipped after order date; no
    receipt/commit dates in this schema).

    r14 optimization (guide §2.4 remove shuffles outright): the
    EXISTS/NOT EXISTS self-join form shuffled (or broadcast) the fact
    table THREE times — l1⋈l2 semi, l1⋈l3 anti, l1⋈orders; at sf0.1
    the planner even built two 600k-row broadcast hash relations of
    lineitem. The equivalent per-order aggregation shuffles lineitem
    ONCE: join orders(F) on orderkey, then aggregate per
    (orderkey, suppkey) and per orderkey — both ride the same hash
    partitioning (subset-key clustering), zero extra exchanges.

    Equivalence (pinned by the unchanged DuckDB EXISTS-form oracle):
    a qualifying l1 row is a LATE line (shipdate > orderdate, order
    status F) of supplier s in order o such that (i) some other
    supplier has a line in o (EXISTS l2 ⇔ distinct suppliers > 1) and
    (ii) no other supplier is late in o (NOT EXISTS l3 ⇔ s is the
    ONLY late supplier). So: per order, if exactly one supplier is
    late and the order has >1 distinct suppliers, that supplier's
    late-line count is the order's contribution to numwait."""
    t = tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    ord_f = t.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (F.col("l_shipdate") > F.col("o_orderdate")).cast("int")
    # ONE explicit hash shuffle on l_orderkey: partitioning by the
    # subset key satisfies the clustering of BOTH grouping levels
    # ((orderkey, suppkey) then (orderkey)), so neither aggregation
    # plans its own exchange (guide §2.4 "two operations keyed the
    # same way can share one exchange"). The `late` flag is computed
    # BEFORE that exchange (r15, guide §2.3 "project before the
    # exchange"): the shuffle carries (orderkey, suppkey, late:int)
    # instead of the two raw date columns it only needed to compare.
    per_supp = (
        li.join(ord_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("any_late"), F.sum("late").alias("n_late"))
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("td"),  # distinct suppliers in order
            F.sum("any_late").alias("ld"),  # distinct LATE suppliers
            F.max(F.when(F.col("any_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
            F.sum("n_late").alias("n_late_lines"),
        )
    )
    waiting = per_order.filter((F.col("ld") == 1) & (F.col("td") > 1))
    sup = (
        t.supplier.join(
            F.broadcast(t.nation.filter(F.col("n_name") == "NATION_4")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name")
    )
    return (
        waiting.join(sup, F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
