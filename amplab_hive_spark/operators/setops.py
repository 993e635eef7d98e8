"""Set operations + assorted §2.9 leftovers.

The reference grammar has NO INTERSECT/EXCEPT (absent from
HiveParser.g — SURVEY §2.1 union row); Spark provides them natively,
so the engine exceeds parity here (documented superset). NOT EXISTS
correlated completes the QBSubQuery rewrite family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register


from amplab_hive_spark.operators._util import run_sql as _sql  # noqa: E402


_INTERSECT = """
SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9500
INTERSECT
SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000
ORDER BY nk
"""


@register("setop_intersect", tags=("setop", "sql"), oracle=_INTERSECT)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT [DISTINCT] — beyond-reference superset (the Hive
    1.2 grammar lacks it); compiles to a left-semi join + distinct."""
    return _sql(spark, sf_dir, _INTERSECT)


_EXCEPT = """
SELECT CAST(c_custkey % 100 AS BIGINT) AS nk FROM customer WHERE c_custkey % 2 = 0
EXCEPT
SELECT CAST(c_custkey % 100 AS BIGINT) AS nk FROM customer WHERE c_custkey % 2 = 1
ORDER BY nk
"""


@register("setop_except", tags=("setop", "sql"), oracle=_EXCEPT)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT [DISTINCT] — beyond-reference superset; left-anti +
    distinct."""
    return _sql(spark, sf_dir, _EXCEPT)


_NOT_EXISTS = """
SELECT s_nationkey, COUNT(*) AS n_idle_suppliers
FROM supplier s
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50 AND l.l_discount >= 0.08
)
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


@register("subquery_not_exists_correlated", tags=("subquery", "anti"), oracle=_NOT_EXISTS)
def subquery_not_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS → left anti join on the correlation key
    (reference: QBSubQuery.java:46 NOT_EXISTS rewrite)."""
    return _sql(spark, sf_dir, _NOT_EXISTS)


@register(
    "grouping_id_virtual_column",
    tags=("agg", "grouping-sets", "sql"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
""",
)
def grouping_id_virtual_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``grouping__id`` virtual column
    (GroupByDesc.java:63) through the SQL surface — Spark spells it
    ``grouping_id()`` with identical bit semantics (verified by the
    oracle's GROUPING(a,b) bitmask)."""
    return _sql(
        spark,
        sf_dir,
        """
SELECT l_returnflag, l_linestatus,
       grouping_id(l_returnflag, l_linestatus) AS gid,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
""",
    )
