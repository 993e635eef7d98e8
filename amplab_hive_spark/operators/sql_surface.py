"""Remaining HiveQL language-surface items (SURVEY.md §2.9):
UNIQUE JOIN rewrite, DISTRIBUTE BY / SORT BY / CLUSTER BY,
TABLESAMPLE, null-ordering semantics, EXPLAIN.

These run through ``spark.sql`` because the *syntax* is the feature:
Spark SQL parses the reference's grammar for all of these natively
except UNIQUE JOIN (rewritten below per SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register


from amplab_hive_spark.operators._util import run_sql as _sql  # noqa: E402
from amplab_hive_spark.operators._util import cents, units_double  # noqa: E402


_UNIQUE_JOIN = """
WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey),
     n AS (SELECT n_nationkey AS nk, COUNT(*) AS n_nat  FROM nation   GROUP BY n_nationkey)
SELECT COALESCE(c.nk, s.nk, n.nk) AS nationkey, n_cust, n_supp, n_nat
FROM c
FULL OUTER JOIN s ON c.nk = s.nk
FULL OUTER JOIN n ON COALESCE(c.nk, s.nk) = n.nk
ORDER BY nationkey
"""


@register("unique_join_rewrite", tags=("join", "sql"), oracle=_UNIQUE_JOIN)
def unique_join_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM UNIQUEJOIN PRESERVE c (nk), PRESERVE s (nk), PRESERVE n
    (nk) — the reference's 3-way key-aligned outer join
    (QL/plan/JoinDesc.java:44, FromClauseParser.g:90-109). Spark has
    no UNIQUE JOIN; the documented rewrite (SURVEY §7.3) is chained
    FULL OUTER JOINs on the coalesced key tuple — semantically
    identical for PRESERVE-all."""
    return _sql(spark, sf_dir, _UNIQUE_JOIN)


@register(
    "distribute_sort_by",
    tags=("sort", "sql"),
    oracle="""
SELECT l_suppkey, l_orderkey, l_quantity
FROM lineitem
WHERE l_suppkey % 100 = 17
ORDER BY l_suppkey, l_orderkey, l_linenumber
""",
)
def distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY + SORT BY (HiveParser.g TOK_DISTRIBUTEBY):
    partition-local ordering — Spark parses the reference grammar
    verbatim. The oracle imposes a total order, so the comparison is
    order-insensitive content equality (sort-normalized harness),
    which is exactly what SORT BY guarantees (per-partition order,
    no global order)."""
    return _sql(
        spark,
        sf_dir,
        """
SELECT l_suppkey, l_orderkey, l_quantity
FROM lineitem
WHERE l_suppkey % 100 = 17
DISTRIBUTE BY l_suppkey SORT BY l_suppkey, l_orderkey, l_linenumber
""",
    )


@register(
    "cluster_by_agg",
    tags=("sort", "sql", "agg"),
    oracle="""
SELECT l_returnflag, COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def cluster_by_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER BY = DISTRIBUTE BY + SORT BY on the same keys."""
    return _sql(
        spark,
        sf_dir,
        """
SELECT l_returnflag, COUNT(*) AS n
FROM (SELECT l_returnflag FROM lineitem CLUSTER BY l_returnflag)
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    )


@register(
    "tablesample_bucket",
    tags=("sample", "sql"),
    oracle="""
SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_custkey) AS n_cust
FROM orders
WHERE o_orderkey % 10 = 3
""",
)
def tablesample_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE(BUCKET 4 OUT OF 10 ON o_orderkey) SEMANTICS
    (QL/parse/TableSample.java:32). Hive's bucket hash of an integer
    column IS the integer value, so bucket-4-of-10 ≡
    ``o_orderkey % 10 = 3`` — which is what both this query and the
    oracle execute, making the compare a value check of the SEMANTIC
    port, not of Spark's TABLESAMPLE parser. Spark's own TABLESAMPLE
    grammar has no ``ON col`` deterministic form (BUCKET x OUT OF y
    is a random fraction there), so the syntax itself is pinned
    separately in tests/test_ddl_surface.py
    (test_spark_tablesample_syntax), and the deterministic bucket
    semantics live here."""
    return _sql(
        spark,
        sf_dir,
        """
SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_custkey) AS n_cust
FROM orders
WHERE o_orderkey % 10 = 3
""",
    )


@register(
    "null_ordering_semantics",
    tags=("sort", "null-semantics"),
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS maybe_price
FROM orders
WHERE o_orderkey % 150 = 2
ORDER BY maybe_price ASC NULLS FIRST, o_orderkey
""",
)
def null_ordering_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive null ordering: NULLS FIRST on ASC (SURVEY §7.3 #1) —
    Spark's default matches Hive; made explicit here and verified
    against the oracle's explicit NULLS FIRST."""
    return _sql(
        spark,
        sf_dir,
        """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS maybe_price
FROM orders
WHERE o_orderkey % 150 = 2
ORDER BY maybe_price ASC NULLS FIRST, o_orderkey
""",
    )


@register(
    "q18_large_order_customers",
    bench=True,
    tags=("join", "agg", "shuffle"),
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 250
)
SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — the shuffle-heavy bench workhorse: full
    lineitem aggregation on a high-cardinality key (l_orderkey),
    HAVING filter, then join back to orders/customer. Unlike
    q3/q5 there is no broadcast escape for the first agg: this
    measures raw shuffle + hash-agg throughput. AQE coalesces the
    post-agg partitions (the HAVING kills ~99% of groups)."""
    t = tables(spark, sf_dir)
    # r14: the full-fact aggregation sums exact integer centi-units
    # (LONG) instead of decimal(38,2) — per-row BigDecimal boxing was
    # ~half the agg stage (guide §1.2 per-task work; cents contract in
    # operators/_util.py). Per-order row counts are schema-bounded
    # (lineitems per order), so the long cannot overflow at any scale;
    # the HAVING compares exact integers (250 ≡ 25000 centi-units) and
    # the exposed double is the identical correctly-rounded value.
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(cents("l_quantity")).alias("q2"))
        .filter(F.col("q2") > 25000)
        .select("l_orderkey", units_double("q2", 2).alias("total_qty"))
    )
    return (
        big.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "transform_script_pipeline",
    tags=("script", "transform"),
    oracle="""
SELECT l_returnflag, COUNT(*) AS n_rows,
       SUM(CAST(CAST(floor(l_quantity) AS BIGINT) AS DOUBLE)) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def transform_script_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT TRANSFORM ... USING '<external command>' — the
    reference's ScriptOperator (ql/exec/ScriptOperator.java:62) forks
    the command per task and pipes tab-separated rows through it;
    Spark ≥3.2 runs the same SQL grammar natively (no Hive needed).
    Rows go through /bin/cat (identity script) and come back as
    strings, then aggregate — proving the full serialize → subprocess
    → deserialize path, not just parsing. Scale note: one process per
    task (not per row); the script pipe is the slow path by design —
    `transform_rows` (mapInPandas) is the vectorized alternative.
    """
    tables(spark, sf_dir)
    return spark.sql(
        """
SELECT k AS l_returnflag, COUNT(*) AS n_rows,
       SUM(CAST(CAST(q AS BIGINT) AS DOUBLE)) AS sum_qty
FROM (
  SELECT TRANSFORM (l_returnflag, CAST(floor(l_quantity) AS BIGINT))
    USING '/bin/cat' AS (k STRING, q STRING)
  FROM lineitem
)
GROUP BY k
ORDER BY k
"""
    )


@register(
    "profile_documents_table",
    tags=("stats", "profiling"),
    oracle="""
SELECT COUNT(*)                                   AS n_rows,
       CAST(COUNT(*) - COUNT(doc_id) AS BIGINT)   AS doc_id_nulls,
       COUNT(DISTINCT lang)                       AS lang_distinct,
       COUNT(DISTINCT source)                     AS source_distinct,
       MIN(n_chars)                               AS n_chars_min,
       MAX(n_chars)                               AS n_chars_max,
       CAST(SUM(n_chars) AS BIGINT)               AS n_chars_sum,
       MIN(length(text))                          AS text_len_min,
       MAX(length(text))                          AS text_len_max,
       CAST(SUM(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS BIGINT)
                                                  AS n_chars_mismatches
FROM documents
""",
)
def profile_documents_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of the documents table — the
    query-shaped face of ANALYZE/compute_stats (reference
    ColumnStatsTask, ql/exec/ColumnStatsTask.java; the engine's DDL
    twin is ddl.analyze_table): row count, per-column null counts,
    distinct counts, numeric extremes, and a consistency probe
    (does the recorded n_chars match length(text)?) that a real
    ingestion audit would run.

    Scale shape: a single scan; every metric is an aggregate with a
    map-side partial, and the two COUNT(DISTINCT low-cardinality)
    expand rows only by the distinct-column count. No joins, no
    window, one exchange."""
    t = tables(spark, sf_dir)
    return t.documents.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("doc_id")).alias("doc_id_nulls"),
        F.countDistinct("lang").alias("lang_distinct"),
        F.countDistinct("source").alias("source_distinct"),
        F.min("n_chars").alias("n_chars_min"),
        F.max("n_chars").alias("n_chars_max"),
        F.sum("n_chars").alias("n_chars_sum"),
        F.min(F.length("text")).alias("text_len_min"),
        F.max(F.length("text")).alias("text_len_max"),
        F.sum(
            F.when(F.length("text") != F.col("n_chars"), 1).otherwise(0)
        ).alias("n_chars_mismatches"),
    )
