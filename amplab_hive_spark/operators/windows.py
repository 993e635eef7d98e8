"""Window functions / PTF operators.

Reference parity (SURVEY.md §2.5): PTFOperator +
WindowingTableFunction (QL/exec/PTFOperator.java:46,
QL/udf/ptf/WindowingTableFunction.java:62) execute window functions
over partitioned/ordered PTF partitions; the registered set
(FunctionRegistry.java:420-432) is lead, lag, row_number, rank,
dense_rank, percent_rank, cume_dist, ntile, first_value, last_value,
plus any UDAF over a window. Frames: ROWS / RANGE BETWEEN
{UNBOUNDED|n} PRECEDING|FOLLOWING|CURRENT ROW
(QL/parse/WindowingSpec.java:212-217).

Spark mapping is 1:1 — Window.partitionBy().orderBy() +
rowsBetween/rangeBetween, identical function names. The reference's
streaming bounded-memory evaluation
(GenericUDAFStreamingEvaluator.java:31) corresponds to Spark's
WindowExec running frames incrementally per partition.

Scale note: a window over partitionBy(k) is one shuffle on k; all
frames evaluate within the partition with no further exchange. Every
ORDER BY here carries a unique tiebreaker column so row-numbering is
deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register

# Keep projected row sets small & deterministic: orders ending in 7.
_ORD_FILTER = "o_orderkey % 100 = 7"


@register(
    "window_rank_suite",
    tags=("window",),
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal,
       ROW_NUMBER()   OVER w AS rn,
       RANK()         OVER w AS rnk,
       DENSE_RANK()   OVER w AS drnk,
       PERCENT_RANK() OVER w AS prnk,
       CUME_DIST()    OVER w AS cdist,
       NTILE(4)       OVER w AS quartile
FROM customer
WHERE c_custkey % 50 = 3
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function set over one window. percent_rank /
    cume_dist are rational (rank-1)/(n-1) and peers/n — identical
    doubles on both engines."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return t.customer.filter(F.col("c_custkey") % 50 == 3).select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_lead_lag",
    tags=("window",),
    oracle=f"""
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice)     OVER w AS prev_price,
       LEAD(o_totalprice)    OVER w AS next_price,
       LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price
FROM orders
WHERE {_ORD_FILTER}
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag with offsets and defaults (reference:
    GenericUDAFLead/Lag via FunctionRegistry.java:420-421)."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t.orders.filter(F.expr(_ORD_FILTER)).select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
    )


@register(
    "window_running_sum",
    tags=("window", "frame"),
    oracle=f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend,
       COUNT(*) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS n_orders_so_far
FROM orders
WHERE {_ORD_FILTER}
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame ROWS UNBOUNDED PRECEDING..CURRENT ROW — the
    reference's default frame with ORDER BY (WindowingSpec.java:253-258).
    Decimal accumulation keeps the running sum exact."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.orders.filter(F.expr(_ORD_FILTER)).select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,2)")).over(w).cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("n_orders_so_far"),
    )


@register(
    "window_sliding_avg",
    tags=("window", "frame"),
    oracle=f"""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg_price
FROM lineitem
WHERE l_suppkey % 200 = 11
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
)
def window_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (3 PRECEDING..CURRENT ROW) moving average,
    expressed as exact-decimal sum / count."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber")
        .rowsBetween(-3, Window.currentRow)
    )
    return t.lineitem.filter(F.col("l_suppkey") % 200 == 11).select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (
            F.sum(F.col("l_extendedprice").cast("decimal(38,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_price"),
    )


@register(
    "window_range_frame",
    tags=("window", "frame"),
    oracle=f"""
SELECT o_orderkey, o_custkey,
       COUNT(*) OVER (
            PARTITION BY o_custkey ORDER BY o_orderkey
            RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
       ) AS n_near_orders
FROM orders
WHERE {_ORD_FILTER}
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame over a numeric order key
    (reference: WindowingSpec RANGE BETWEEN n PRECEDING)."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-1000, Window.currentRow)
    return t.orders.filter(F.expr(_ORD_FILTER)).select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_near_orders"),
    )


@register(
    "window_first_last",
    tags=("window", "frame"),
    oracle=f"""
SELECT o_custkey, o_orderkey, o_totalprice,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice)  OVER w AS last_price,
       MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS max_price
FROM orders
WHERE {_ORD_FILTER}
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with an explicit full frame — the
    reference special-cases last_value's default frame to the peer
    row (WindowingSpec.java:229-238); an explicit frame sidesteps
    that divergence, which is also the portable-SQL idiom."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wp = Window.partitionBy("o_custkey")
    return t.orders.filter(F.expr(_ORD_FILTER)).select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.max("o_totalprice").over(wp).alias("max_price"),
    )


@register(
    "window_topn_per_group",
    tags=("window", "topk"),
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal, rn
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) ranked
WHERE rn <= 3
ORDER BY c_mktsegment, rn
""",
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group — the reference's PTFTopNHash push-down
    (QL/exec/PTFTopNHash.java); Spark ≥3.5 optimizes rn<=k into
    WindowGroupLimit before the shuffle (check .explain)."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        t.customer.select(
            "c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )
