"""Core relational operators: scan/filter/project, all join
mechanisms, sort/limit/top-k, union, distinct, sampling.

Reference parity (SURVEY.md §2.1, §2.3): FilterOperator/
SelectOperator → df.filter/select; JoinOperator (shuffle join, six
join types, QL/plan/JoinDesc.java:40-45) → df.join(how=...);
MapJoinOperator (broadcast hash join, QL/exec/MapJoinOperator.java:51)
→ broadcast() hint; ReduceSink top-k (QL/exec/TopNHash.java:45) →
orderBy().limit() = TakeOrderedAndProject; UnionOperator
(QL/exec/UnionOperator.java:38) → unionAll / union+distinct;
TABLESAMPLE (QL/parse/TableSample.java:32) → deterministic modulus
sampling so the oracle can reproduce it.

Scale notes: every query here is declarative — Catalyst pushes
filters/projections into the Parquet scan, AQE sizes the shuffles,
and dimension tables under the broadcast threshold go out as
broadcast hash joins without a hint. The explicit ``F.broadcast``
hints mark joins whose small side is bounded by schema (region: 5
rows, nation: 25 rows at ANY scale factor) — guaranteed broadcastable
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.operators._util import (
    O_CHARGE,
    O_DISC_PRICE,
    cents,
    charge,
    davg,
    disc_price,
    dsum,
    o_davg,
    o_dsum,
)
from amplab_hive_spark.registry import register

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (SURVEY.md §7.0)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    bench=True,
    tags=("scan", "filter", "agg", "sort"),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {o_dsum('l_quantity')} AS sum_qty,
       {o_dsum('l_extendedprice')} AS sum_base_price,
       {o_dsum(O_DISC_PRICE)} AS sum_disc_price,
       {o_dsum(O_CHARGE, scale=6)} AS sum_charge,
       {o_davg('l_quantity')} AS avg_qty,
       {o_davg('l_extendedprice')} AS avg_price,
       {o_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan→filter→partial/final agg→sort. The shipdate filter is
    pushed into the Parquet scan; the 6-group output makes the final
    exchange trivial at any scale.

    r14 optimization (guide §1.2 "per-task work", §2.3 "narrower
    types"): the money sums run in exact integer fixed-point (LONG
    units — see the cents contract in operators/_util.py) instead of
    per-row decimal(38,·) BigDecimal arithmetic, measured 2× the whole
    query at sf0.1. Because the total over ALL rows of a group can
    exceed a long at 100 TB, the sum is two-level: long partials per
    (group, spark_partition_id, key sub-bucket) — a per-partition-
    complete map-side aggregation, so the exchange carries ~6×64 rows
    per input partition — then an exact decimal(38,0) sum of the
    partials. Bit-identical output (pinned by
    tests/test_cents_money.py + the DuckDB oracle).

    r15 (ADVICE r14): the partial key additionally sub-splits by
    pmod(l_orderkey, 64). A long partial of e6 charge units wraps
    silently past ~7e7 rows per partial group; with spark_partition_id
    alone that bound was a scan-split-size comment in _util.py, not a
    structural guarantee. The 64-way sub-bucket raises the wrap point
    to ~4.5e9 rows (~1 TB of lineitem parquet) PER SCAN SPLIT — no
    real deployment's split reaches it — at the cost of ≤ 6×64 extra
    partial rows per partition in the tiny second exchange (measured:
    no per-row cost difference; the hash key is wider but the group
    count per task is still trivially cache-resident)."""
    t = tables(spark, sf_dir)
    p2, d2, t2, q2 = (cents(c) for c in
                      ("l_extendedprice", "l_discount", "l_tax", "l_quantity"))
    partials = (
        t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select(
            "l_returnflag", "l_linestatus",
            q2.alias("q2"), p2.alias("p2"), d2.alias("d2"),
            (p2 * (100 - d2)).alias("disc4"),
            (p2 * (100 - d2) * (100 + t2)).alias("charge6"),
            F.pmod(F.col("l_orderkey"), F.lit(64)).alias("_sub"),
        )
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"),
                 "_sub")
        .agg(
            F.sum("q2").alias("sq"), F.sum("p2").alias("sp"),
            F.sum("disc4").alias("sd"), F.sum("charge6").alias("sc"),
            F.sum("d2").alias("sdisc"), F.count(F.lit(1)).alias("cnt"),
            # avg divisors are per-column NON-NULL counts, exactly like
            # the decimal pipeline's davg (COUNT(expr), not COUNT(*))
            F.count("q2").alias("cq"), F.count("p2").alias("cp"),
            F.count("d2").alias("cd"),
        )
    )
    totals = (
        partials.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("sq").cast("decimal(38,0)")).alias("sq"),
            F.sum(F.col("sp").cast("decimal(38,0)")).alias("sp"),
            F.sum(F.col("sd").cast("decimal(38,0)")).alias("sd"),
            F.sum(F.col("sc").cast("decimal(38,0)")).alias("sc"),
            F.sum(F.col("sdisc").cast("decimal(38,0)")).alias("sdisc"),
            F.sum("cnt").alias("cnt"),
            F.sum("cq").alias("cq"), F.sum("cp").alias("cp"),
            F.sum("cd").alias("cd"),
        )
    )
    return (
        totals.select(
            "l_returnflag", "l_linestatus",
            (F.col("sq") / 100).cast("double").alias("sum_qty"),
            (F.col("sp") / 100).cast("double").alias("sum_base_price"),
            (F.col("sd") / 10000).cast("double").alias("sum_disc_price"),
            (F.col("sc") / 1000000).cast("double").alias("sum_charge"),
            ((F.col("sq") / 100).cast("double") / F.col("cq")).alias("avg_qty"),
            ((F.col("sp") / 100).cast("double") / F.col("cp")).alias("avg_price"),
            ((F.col("sdisc") / 100).cast("double") / F.col("cd")).alias("avg_disc"),
            F.col("cnt").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Scan / filter / project
# ---------------------------------------------------------------------------


@register(
    "scan_filter_project",
    tags=("scan", "filter", "project"),
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       CAST({O_DISC_PRICE} AS DOUBLE) AS revenue,
       CAST(l_shipdate AS DATE) AS ship_date
FROM lineitem
WHERE l_quantity > 45 AND l_discount >= 0.07
  AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
""",
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive pushed-down predicates + computed projection.
    `.explain` shows PushedFilters on all three columns and a pruned
    ReadSchema — the scan never materializes unused columns."""
    t = tables(spark, sf_dir)
    return t.lineitem.filter(
        (F.col("l_quantity") > 45)
        & (F.col("l_discount") >= 0.07)
        & F.col("l_shipdate").between(
            F.lit("1997-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    ).select(
        "l_orderkey",
        "l_linenumber",
        disc_price().cast("double").alias("revenue"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


# ---------------------------------------------------------------------------
# Multi-way joins (TPC-H Q3 / Q5 shapes) — the bench workhorses
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    bench=True,
    tags=("join", "agg", "topk"),
    oracle=f"""
SELECT l_orderkey,
       {o_dsum(O_DISC_PRICE)} AS revenue,
       CAST(o_orderdate AS DATE) AS order_date
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-k. customer is ~1.5% of lineitem rows —
    AQE broadcasts the filtered customer side; the orders⋈lineitem
    shuffle is keyed on orderkey (high-cardinality, no skew). The
    final ORDER BY+LIMIT compiles to TakeOrderedAndProject (the
    reference needs TopNHash inside ReduceSink for this)."""
    t = tables(spark, sf_dir)
    cutoff = F.lit("1995-03-15").cast("timestamp")
    # r14: lineitem STREAMS, the filtered customer⋈orders side builds
    # the (much smaller) broadcast. The previous order put the filtered
    # lineitem on the build side — a 300k-row hash relation built from
    # the fact table (guide §3.1: broadcast the side you know is small;
    # estimates after filters are unreliable). At cluster scale the
    # same order keeps the fact table out of any broadcast attempt.
    return (
        t.lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(
            t.customer.filter(F.col("c_mktsegment") == "BUILDING")
            .join(t.orders.filter(F.col("o_orderdate") < cutoff),
                  F.col("c_custkey") == F.col("o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(disc_price(), "revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("order_date"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    bench=True,
    tags=("join", "agg", "broadcast"),
    oracle=f"""
SELECT n_name,
       {o_dsum(O_DISC_PRICE)} AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN supplier ON s_nationkey = n_nationkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey AND l_suppkey = s_suppkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way star join. region/nation/supplier are broadcast
    explicitly (bounded size at any SF); the only real shuffle is
    orders⋈lineitem on orderkey. Join order follows the star: prune
    with the smallest dimensions first so Catalyst can pipeline the
    broadcast probes inside one stage."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.join(
            F.broadcast(
                t.supplier.join(
                    F.broadcast(
                        t.nation.join(
                            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
                            F.col("n_regionkey") == F.col("r_regionkey"),
                        )
                    ),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            t.orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t.customer, (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(dsum(disc_price(), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "join_broadcast_dim",
    tags=("join", "broadcast", "agg"),
    oracle=f"""
SELECT p_brand, COUNT(*) AS n_lines, {o_dsum('l_quantity')} AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
""",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with an explicit broadcast hint (reference: hinted
    map-join, QL/optimizer/MapJoinProcessor.java:86). part grows with
    SF but stays MB-scale — the hint removes the shuffle entirely, so
    the plan is scan→broadcast-probe→partial agg→tiny exchange."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity", "total_qty"))
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# The six join types (QL/plan/JoinDesc.java:40-45) + cross + theta
# ---------------------------------------------------------------------------


@register(
    "join_inner",
    tags=("join",),
    oracle=f"""
SELECT c_mktsegment, COUNT(*) AS n_orders, {o_dsum('o_totalprice')} AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))
        .orderBy("c_mktsegment")
    )


@register(
    "join_left_outer",
    tags=("join",),
    oracle=f"""
SELECT c_custkey, COUNT(o_orderkey) AS n_orders, {o_dsum('o_totalprice')} AS spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER keeps order-less customers (NULL-extended rows);
    COUNT(col) skips the NULLs — the classic outer-join + aggregate
    semantics check."""
    t = tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"), dsum("o_totalprice", "spent"))
    )


@register(
    "join_right_outer",
    tags=("join",),
    oracle=f"""
SELECT s_suppkey, COUNT(l_orderkey) AS n_lines
FROM lineitem RIGHT JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t.lineitem.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"), "right")
        .groupBy("s_suppkey")
        .agg(F.count("l_orderkey").alias("n_lines"))
    )


@register(
    "join_full_outer",
    tags=("join",),
    oracle="""
WITH big_cust AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer
  GROUP BY c_nationkey HAVING COUNT(*) > 60
), any_supp AS (
  SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
  GROUP BY s_nationkey
)
SELECT COALESCE(big_cust.nk, any_supp.nk) AS nationkey,
       n_cust, n_supp
FROM big_cust FULL OUTER JOIN any_supp ON big_cust.nk = any_supp.nk
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER with unmatched rows on both sides (nations with
    many customers but no suppliers and vice versa)."""
    t = tables(spark, sf_dir)
    big_cust = (
        t.customer.groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .filter(F.col("n_cust") > 60)
    )
    any_supp = t.supplier.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return big_cust.join(any_supp, "nk", "full").select(
        F.col("nk").alias("nationkey"), "n_cust", "n_supp"
    )


@register(
    "join_left_semi",
    tags=("join", "semi"),
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI JOIN — the reference rewrites IN/EXISTS subqueries to
    it (QL/parse/QBSubQuery.java:42-46); Spark exposes it directly."""
    t = tables(spark, sf_dir)
    f_orders = t.orders.filter(F.col("o_orderstatus") == "F")
    return (
        t.customer.join(f_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "join_left_anti",
    tags=("join", "anti"),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_custkey % 3 = 0
)
""",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI JOIN = NOT EXISTS (reference: NOT IN/NOT EXISTS
    rewrite, QBSubQuery.java:44,46). The right side is restricted to
    ``o_custkey % 3 = 0`` so unmatched customers EXIST by construction
    at every SF — the unrestricted form certified on zero rows
    (every customer has orders in this testdata; the r9/r11 vacuity
    lesson: an agreement on empty proves nothing about the anti
    semantics)."""
    t = tables(spark, sf_dir)
    orders_sub = t.orders.filter("o_custkey % 3 = 0")
    return t.customer.join(
        orders_sub, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_cross",
    tags=("join", "cross"),
    oracle="""
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — reference warns via CrossProductCheck
    (QL/optimizer/physical/CrossProductCheck.java:88); Spark executes
    it as BroadcastNestedLoopJoin when one side is tiny."""
    t = tables(spark, sf_dir)
    statuses = t.orders.select("o_orderstatus").distinct()
    return t.region.crossJoin(statuses).select("r_name", "o_orderstatus")


@register(
    "join_theta",
    tags=("join", "theta"),
    oracle="""
SELECT a.n_name AS nation_a, b.n_name AS nation_b
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
ORDER BY nation_a, nation_b
""",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi join predicate (reference only supports this as
    cross-product + filter; Spark evaluates mixed equi+range
    conditions inside the join)."""
    t = tables(spark, sf_dir)
    a = t.nation.alias("a")
    b = t.nation.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))
        .orderBy("nation_a", "nation_b")
    )


# ---------------------------------------------------------------------------
# Union / distinct / sort / limit / sample
# ---------------------------------------------------------------------------


@register(
    "union_all_counts",
    tags=("union", "agg"),
    oracle="""
SELECT k % 10 AS key_mod, COUNT(*) AS n
FROM (
  SELECT o_orderkey AS k FROM orders
  UNION ALL
  SELECT l_orderkey AS k FROM lineitem
) u
GROUP BY k % 10
ORDER BY key_mod
""",
)
def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    u = t.orders.select(F.col("o_orderkey").alias("k")).unionAll(
        t.lineitem.select(F.col("l_orderkey").alias("k"))
    )
    return (
        u.groupBy((F.col("k") % 10).alias("key_mod"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("key_mod")
    )


@register(
    "union_distinct",
    tags=("union", "distinct"),
    oracle="""
SELECT nk FROM (
  SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
  UNION
  SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000
) u
ORDER BY nk
""",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT = union + groupby in the reference grammar
    (HiveParser.g:2056-2057); Spark's union().distinct()."""
    t = tables(spark, sf_dir)
    return (
        t.customer.filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nk"))
        .union(t.supplier.filter(F.col("s_acctbal") > 9000).select(F.col("s_nationkey").alias("nk")))
        .distinct()
        .orderBy("nk")
    )


@register(
    "distinct_select",
    tags=("distinct",),
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
""",
)
def distinct_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t.lineitem.select("l_returnflag", "l_linestatus").distinct().orderBy(
        "l_returnflag", "l_linestatus"
    )


@register(
    "topk_orders",
    tags=("sort", "limit", "topk"),
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject: each partition keeps
    a 15-element heap, the driver merges — no global sort at any
    scale (reference needs TopNHash + LimitPushdownOptimizer)."""
    t = tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(15)
    )


@register(
    "sample_deterministic",
    tags=("sample",),
    oracle=f"""
SELECT COUNT(*) AS n_rows, {o_dsum('l_extendedprice')} AS sampled_price
FROM lineitem WHERE l_orderkey % 20 = 1
""",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE(BUCKET 1 OUT OF 20 ON l_orderkey) semantics
    (reference: QL/parse/TableSample.java:32) expressed as a
    deterministic modulus predicate so the oracle reproduces the
    exact sample — Bernoulli df.sample() is seed-dependent and
    engine-specific."""
    t = tables(spark, sf_dir)
    return t.lineitem.filter(F.col("l_orderkey") % 20 == 1).agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("l_extendedprice", "sampled_price")
    )
