"""Hive semantics deltas (SURVEY.md §7.3 hard-part #1) — the places
where Hive, Spark, and ANSI SQL disagree: integer ``/`` returning
double, ``div`` floor division, C-style signed ``%`` vs ``pmod``,
string↔number implicit casts (non-ANSI mode), TZ-less TIMESTAMP
rendering, and decimal precision promotion
(reference: QL/exec/FunctionRegistry.java:187-218 arithmetic
registrations; SERDE decimal promotion rules SURVEY §1.3).

Spark side runs with ``spark.sql.ansi.enabled=false`` (session.py)
— the Hive-compatible dialect. The oracle spells each implicit
behavior explicitly (DuckDB is strictly typed), which is itself the
documentation of what the implicit semantics are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register

_ORACLE = """
SELECT l_linenumber,
       l_linenumber / 4                                    AS int_div_true,
       CAST(l_linenumber // 4 AS BIGINT)                   AS int_div_floor,
       CAST((3 - l_linenumber) % 5 AS BIGINT)              AS mod_signed,
       CAST(((3 - l_linenumber) % 5 + 5) % 5 AS BIGINT)    AS mod_positive,
       CAST('3' AS DOUBLE) + l_linenumber                  AS str_plus_int,
       CAST(l_shipdate AS VARCHAR)                         AS ts_rendered
FROM lineitem
WHERE l_orderkey = (SELECT MIN(l_orderkey) FROM lineitem)
ORDER BY l_linenumber
"""

_SPARK_SQL = """
SELECT l_linenumber,
       l_linenumber / 4                         AS int_div_true,
       CAST(l_linenumber div 4 AS BIGINT)       AS int_div_floor,
       CAST((3 - l_linenumber) % 5 AS BIGINT)   AS mod_signed,
       CAST(pmod(3 - l_linenumber, 5) AS BIGINT) AS mod_positive,
       '3' + l_linenumber                       AS str_plus_int,
       CAST(l_shipdate AS STRING)               AS ts_rendered
FROM lineitem
WHERE l_orderkey = (SELECT MIN(l_orderkey) FROM lineitem)
ORDER BY l_linenumber
"""


@register("hive_semantics_arithmetic", tags=("semantics", "function"), oracle=_ORACLE)
def hive_semantics_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive arithmetic dialect probe: int ``/`` → double; ``div``
    floors; ``%`` keeps the dividend's sign while ``pmod`` is always
    non-negative; ``'3' + n`` implicitly casts the string to double
    (non-ANSI); TIMESTAMP renders TZ-less as
    ``yyyy-MM-dd HH:mm:ss``. The oracle writes every implicit step
    explicitly."""
    tables(spark, sf_dir)
    return spark.sql(_SPARK_SQL)
