"""Aggregation operators: GROUP BY, DISTINCT aggregates, grouping
sets / ROLLUP / CUBE, the UDAF surface, and sketch aggregates.

Reference parity (SURVEY.md §2.4): GroupByOperator hash/sort modes
(QL/exec/GroupByOperator.java:108,342-390) → Spark HashAggregateExec
partial+final (automatic); DISTINCT aggregates (GroupByDesc.java:39-41)
→ Catalyst RewriteDistinctAggregates; grouping sets grammar
(QL/parse/HiveParser.g:79-80, TOK_ROLLUP/CUBE_GROUPBY) →
df.rollup/cube + F.grouping_id; UDAF registrations
(QL/exec/FunctionRegistry.java:342-370): max,min,sum,count,avg,
stddev*,var*,covar*,corr,percentile,percentile_approx,collect_set,
collect_list,histogram_numeric; FM-sketch NDV estimation
(QL/udf/generic/NumDistinctValueEstimator.java:28) →
approx_count_distinct (HLL++).

Numeric policy: moment-based UDAFs (variance/stddev/covar/corr) are
computed from EXACT decimal power sums and combined in double with
the same formula the oracle uses — bit-reproducible across engines
and across partition orders (a plain double stddev is neither).
At scale this is also the right answer: decimal sums are
associative, so partial aggregation never drifts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.operators._util import davg, dsum, o_davg, o_dsum
from amplab_hive_spark.registry import register


# ---------------------------------------------------------------------------
# Basic aggregate suite
# ---------------------------------------------------------------------------


@register(
    "agg_basic_suite",
    tags=("agg",),
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       {o_dsum('l_quantity')} AS sum_qty,
       {o_davg('l_extendedprice')} AS avg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_basic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / count-distinct / min / max / sum / avg in one pass.
    count(distinct) triggers Catalyst's RewriteDistinctAggregates
    expand — one extra shuffle, same as the reference's PARTIALS
    mode (GroupByDesc.java:39-41)."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            dsum("l_quantity", "sum_qty"),
            davg("l_extendedprice", "avg_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_variance_corr",
    tags=("agg", "udaf"),
    oracle="""
WITH cents AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)) AS cx,
         CAST(CAST(l_quantity      AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)) AS cy
  FROM lineitem
),
sums AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(cx) AS sx, SUM(cx * cx) AS sxx,
         SUM(cy) AS sy, SUM(cy * cy) AS syy, SUM(cx * cy) AS sxy
  FROM cents GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(n * sxx - sx * sx AS DOUBLE) / n / (n - 1) / 10000.0 AS var_price,
       SQRT(CAST(n * sxx - sx * sx AS DOUBLE) / n / (n - 1) / 10000.0) AS stddev_price,
       CAST(n * sxy - sx * sy AS DOUBLE) / n / n / 10000.0 AS covar_pop_qty,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) * SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_price_qty
FROM sums
ORDER BY l_returnflag
""",
)
def agg_variance_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """var_samp / stddev_samp / covar_pop (reference UDAFs:
    GenericUDAFVariance family, FunctionRegistry.java:342-370).

    Numerics: the whole cancellation-prone combination
    ``n·Σx² − (Σx)²`` is computed EXACTLY in integer-cents decimals;
    only the final quotient touches doubles. A naive power-sum
    formula in doubles amplifies a single-ulp decimal→double
    conversion difference into visible drift (observed at sf0.001) —
    and is also partition-order-dependent at cluster scale."""
    t = tables(spark, sf_dir)
    cents = t.lineitem.select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("decimal(38,0)").alias("cx"),
        (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("decimal(38,0)").alias("cy"),
    )
    n = F.count(F.lit(1))
    sums = cents.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.sum("cx").alias("sx"),
        F.sum(F.col("cx") * F.col("cx")).alias("sxx"),
        F.sum("cy").alias("sy"),
        F.sum(F.col("cy") * F.col("cy")).alias("syy"),
        F.sum(F.col("cx") * F.col("cy")).alias("sxy"),
    )
    nn = F.col("n")
    var = (
        (nn * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        / nn
        / (nn - 1)
        / F.lit(10000.0)
    )
    covar = (
        (nn * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / nn
        / nn
        / F.lit(10000.0)
    )
    corr = (nn * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.sqrt((nn * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        * F.sqrt((nn * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    )
    return sums.select(
        "l_returnflag",
        "n",
        var.alias("var_price"),
        F.sqrt(var).alias("stddev_price"),
        covar.alias("covar_pop_qty"),
        corr.alias("corr_price_qty"),
    ).orderBy("l_returnflag")


@register(
    "agg_collect_set",
    tags=("agg", "udaf", "complex-types"),
    oracle="""
SELECT l_returnflag,
       list_sort(list(DISTINCT l_linestatus)) AS statuses,
       list_sort(list(DISTINCT CAST(l_quantity AS INT) // 10)) AS qty_buckets
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set (reference: GenericUDAFCollectSet) — surfaced
    sorted so the set is order-canonical."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.sort_array(F.collect_set("l_linestatus")).alias("statuses"),
            F.sort_array(
                F.collect_set((F.col("l_quantity").cast("int") / 10).cast("int"))
            ).alias("qty_buckets"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_percentile_exact",
    tags=("agg", "udaf"),
    oracle="""
SELECT l_linestatus,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.75) AS q75
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (reference: GenericUDAFPercentile).
    l_quantity is integer-valued and the fractions are dyadic, so the
    interpolation is exact in double on both engines."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_linestatus")
        .agg(
            F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
            F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
            F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "count_distinct_multi",
    tags=("agg", "distinct"),
    oracle="""
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_dates
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def count_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates in one query → Catalyst Expand
    (one input row fans out per distinct group) — the reference
    needs one MR job per distinct set pre-CBO."""
    t = tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_dates"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# ROLLUP / CUBE / GROUPING SETS (+ grouping_id virtual column)
# ---------------------------------------------------------------------------


@register(
    "rollup_pricing",
    tags=("agg", "grouping-sets"),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       COUNT(*) AS n,
       {o_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
""",
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with the grouping__id virtual column (reference:
    HiveParser.g:79 TOK_ROLLUP_GROUPBY + GroupByDesc grouping-sets
    flag). Spark expands to an Expand node — one shuffle total,
    where the reference pre-CBO runs one job per grouping set."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity", "sum_qty"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


@register(
    "cube_segment_priority",
    tags=("agg", "grouping-sets", "join"),
    oracle=f"""
SELECT c_mktsegment, o_orderpriority,
       GROUPING(c_mktsegment, o_orderpriority) AS gid,
       COUNT(*) AS n_orders,
       {o_dsum('o_totalprice')} AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE(c_mktsegment, o_orderpriority)
ORDER BY gid, c_mktsegment, o_orderpriority
""",
)
def cube_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over a join (reference: TOK_CUBE_GROUPBY)."""
    t = tables(spark, sf_dir)
    return (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total"),
        )
        .orderBy("gid", "c_mktsegment", "o_orderpriority")
    )


# One constant serves as BOTH the Spark SQL and the oracle — this
# query's point is that the identical ANSI text runs on either
# engine; two hand-kept copies could silently drift apart.
_GROUPING_SETS_MIXED_SQL = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       {o_dsum('l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "grouping_sets_mixed",
    tags=("agg", "grouping-sets", "sql"),
    oracle=_GROUPING_SETS_MIXED_SQL,
)
def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL surface — the engine's
    HiveQL path (spark.sql) rather than the DataFrame DSL."""
    tables(spark, sf_dir)  # ensure temp views
    return spark.sql(_GROUPING_SETS_MIXED_SQL)


# ---------------------------------------------------------------------------
# Sketch aggregates (no deterministic cross-engine oracle: HLL++ /
# GK-quantile / histogram internals are engine-specific → rows-only)
# ---------------------------------------------------------------------------


@register(
    "sketch_aggregates",
    tags=("agg", "sketch"),
    oracle=None,
)
def sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++; reference: FM-sketch
    NumDistinctValueEstimator.java:28), percentile_approx (reference:
    GenericUDAFPercentileApprox) and histogram_numeric. Sketch
    contents are engine-defined, hence no DuckDB hash oracle; the
    parity test instead bounds approx vs exact error (rel. err ≤ 5%).
    At 100 TB these are the ONLY viable forms of distinct-count /
    quantile — exact distinct shuffles the full key set."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
            F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx_median_price"),
            F.histogram_numeric("l_quantity", F.lit(5)).alias("qty_histogram"),
        )
        .orderBy("l_returnflag")
    )
