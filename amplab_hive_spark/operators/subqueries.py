"""Subqueries, CTEs, and views.

Reference parity (SURVEY.md §2.9): IN/NOT IN/EXISTS/NOT EXISTS in
WHERE are rewritten to semi/anti joins by QL/parse/QBSubQuery.java:42-46;
CTEs are TOK_CTE (HiveParser.g:329); views store
viewExpandedText in the metastore (MTable.java). Spark's Catalyst
RewritePredicateSubquery performs the identical rewrite, including
the null-aware anti join for NOT IN.

These queries run through ``spark.sql`` — the engine's HiveQL
surface — because subquery syntax IS the feature being tested;
the DataFrame DSL has no subquery form.

Scale note: Catalyst turns every predicate subquery into a join that
participates in normal join planning (broadcast if small, shuffle
otherwise). A correlated scalar subquery becomes a left outer join
on the correlation key — no per-row re-execution, unlike naive
interpreters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.operators._util import o_dsum
from amplab_hive_spark.registry import register


from amplab_hive_spark.operators._util import run_sql as _sql  # noqa: E402


_SCALAR_SUBQ = f"""
SELECT o_orderpriority, COUNT(*) AS n_big_orders
FROM orders
WHERE o_totalprice > (SELECT {o_dsum('o_totalprice', scale=2)} / COUNT(*) FROM orders)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("subquery_scalar", tags=("subquery",), oracle=_SCALAR_SUBQ)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in WHERE. The threshold (mean
    price) is an exact-decimal average so both engines compare
    against the bitwise-same double."""
    return _sql(spark, sf_dir, _SCALAR_SUBQ)


_IN_SUBQ = """
SELECT s_nationkey, COUNT(*) AS n_suppliers
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49
)
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


@register("subquery_in", tags=("subquery", "semi"), oracle=_IN_SUBQ)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → left semi join (reference: QBSubQuery.java:42)."""
    return _sql(spark, sf_dir, _IN_SUBQ)


_NOT_IN_SUBQ = """
SELECT p_brand, COUNT(*) AS n_parts
FROM part
WHERE p_partkey NOT IN (
    SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09
)
GROUP BY p_brand
ORDER BY p_brand
"""


@register("subquery_not_in", tags=("subquery", "anti"), oracle=_NOT_IN_SUBQ)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (subquery) → null-aware anti join (reference rewrites
    via QBSubQuery.java:44; Catalyst: RewritePredicateSubquery)."""
    return _sql(spark, sf_dir, _NOT_IN_SUBQ)


_EXISTS_CORR = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("subquery_exists_correlated", tags=("subquery", "semi"), oracle=_EXISTS_CORR)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → semi join on the correlation key."""
    return _sql(spark, sf_dir, _EXISTS_CORR)


_SCALAR_CORR = """
SELECT c.c_custkey,
       (SELECT MAX(o.o_totalprice) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS max_order_price
FROM customer c
WHERE c.c_custkey % 40 = 1
ORDER BY c.c_custkey
"""


@register("subquery_scalar_correlated", tags=("subquery",), oracle=_SCALAR_CORR)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in SELECT → left outer join +
    aggregate (NULL for customers with no orders)."""
    return _sql(spark, sf_dir, _SCALAR_CORR)


_CTE = """
WITH seg_spend AS (
    SELECT c_mktsegment, o_custkey,
           SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_custkey
),
seg_stats AS (
    SELECT c_mktsegment, CAST(SUM(spend) AS DOUBLE) AS total_spend,
           COUNT(*) AS n_buyers
    FROM seg_spend
    GROUP BY c_mktsegment
)
SELECT c_mktsegment, total_spend, n_buyers,
       total_spend / n_buyers AS spend_per_buyer
FROM seg_stats
ORDER BY c_mktsegment
"""


@register("cte_multilevel", tags=("cte",), oracle=_CTE)
def cte_multilevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained CTEs (reference: TOK_CTE, HiveParser.g:329)."""
    return _sql(spark, sf_dir, _CTE)


@register(
    "view_over_view",
    tags=("view", "ddl"),
    oracle="""
SELECT n_name, COUNT(*) AS n_rich
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 5000
GROUP BY n_name
ORDER BY n_name
""",
)
def view_over_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW chain (reference: VIRTUAL_VIEW table type,
    MTable.java:26-37 viewExpandedText) — a view over a view, then a
    query over that; Catalyst inlines both at analysis time."""
    tables(spark, sf_dir)
    spark.sql(
        """CREATE OR REPLACE TEMPORARY VIEW rich_customers AS
           SELECT * FROM customer WHERE c_acctbal > 5000"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY VIEW rich_by_nation AS
           SELECT c_nationkey, c_custkey FROM rich_customers"""
    )
    return spark.sql(
        """
SELECT n_name, COUNT(*) AS n_rich
FROM rich_by_nation JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""
    )
