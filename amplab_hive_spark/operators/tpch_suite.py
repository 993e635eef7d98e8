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


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    tables(spark, sf_dir)
    return spark.sql(text)


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
  WHERE ((n1.n_name = 'nation_1' AND n2.n_name = 'nation_2')
      OR (n1.n_name = 'nation_2' AND n2.n_name = 'nation_1'))
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
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
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
