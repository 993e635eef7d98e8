"""Temporal joins the reference engine lacks: as-of join and banded
range join, re-expressed Spark-first.

The reference (WANdisco/amplab-hive) has no point-in-time join — its
closest shape is a windowing PTF (ql/.../PTFOperator.java), which is
exactly the machinery the scalable Spark implementation leans on:

- **As-of join** = union the probe and build streams with a side
  marker, shuffle ONCE on the key, and carry the build side's last
  value forward with a running ``last(..., ignorenulls=True)`` window.
  Cost is one exchange plus a linear in-partition scan — no range
  blow-up, no per-row binary search, and skew is bounded by the
  per-key event count. This is the standard large-scale as-of shape
  (kdb's aj / Flink temporal join semantics) expressed with stock
  Spark operators, so Catalyst/Tungsten run the whole thing
  JVM-side.

- **Range join** ("events within the last 10 minutes") = band both
  sides into fixed time buckets and equi-join on (key, bucket).
  A probe row can only match build rows in its own bucket or the
  previous one when the bucket width equals the range width, so the
  build side is exploded into exactly 2 buckets — bounded 2× fan-out,
  linear shuffle volume, no O(N·M) interval cross-product. Catalyst
  alone would execute the naive form as a broadcast-nested-loop or a
  cartesian-with-filter; the banding turns it into a plain hash join.

Both are oracled against DuckDB's native ASOF JOIN / correlated
interval join at sf0.01 — the semantics gate is exact, the physical
strategy is Spark's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register


def _epoch_us(c) -> "F.Column":
    """Microseconds since epoch, tolerant of both timestamp
    generations of the events table (TIMESTAMP vs TIMESTAMP_NTZ —
    ``unix_micros`` rejects NTZ; the cast interprets NTZ in the
    session zone, which the catalog pins to UTC, matching DuckDB's
    ``epoch_us`` on a naive timestamp)."""
    return F.unix_micros(c.cast("timestamp"))


_ASOF_ORACLE = """
SELECT p.event_id, p.user_id,
       p.ts AS purchase_ts,
       c.ts AS click_ts,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


@register("events_asof_join", tags=("temporal", "join"), oracle=_ASOF_ORACLE)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the most recent click by the same user at
    or before the purchase instant (NULL when none) — an as-of join.

    Implementation: union-marker + running-last window. Clicks sort
    before purchases at equal timestamps (side 0 < 1), matching the
    oracle's inclusive ``p.ts >= c.ts``. One shuffle on user_id; the
    window is a single forward scan per partition, so the plan
    survives a 100× scale-up as long as one user's history fits a
    partition (true by construction for per-user event streams).
    """
    ev = tables(spark, sf_dir).events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.col("ts").alias("click_ts_carry"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(0).alias("side"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.lit(None).cast(ev.schema["ts"].dataType).alias("click_ts_carry"),
        "event_id",
        F.lit(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ev_ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("click_ts", F.last("click_ts_carry", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ev_ts").alias("purchase_ts"),
            "click_ts",
            (_epoch_us(F.col("ev_ts")) - _epoch_us(F.col("click_ts"))).alias("gap_us"),
        )
        .orderBy("event_id")
    )


_RANGE_SECONDS = 600  # 10-minute lookback == bucket width

_RANGE_ORACLE = f"""
SELECT p.event_id,
       COUNT(c.event_id) AS n_recent_clicks
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts > p.ts - INTERVAL {_RANGE_SECONDS} SECOND
 AND c.ts <= p.ts
GROUP BY p.event_id
ORDER BY p.event_id
"""


@register("events_range_join", tags=("temporal", "join"), oracle=_RANGE_ORACLE)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks within the 10 minutes before each purchase, per user —
    a bounded range join via time banding.

    Each click is exploded into exactly 2 buckets (its own and the
    next), because with bucket width == range width a purchase's
    lookback interval spans at most 2 buckets. The join is then a
    plain equi-join on (user_id, bucket) with a residual interval
    filter — hash-joinable, AQE-skew-splittable, and shuffle volume
    is 2·|clicks| + |purchases| regardless of time density. The
    naive ``ON a.ts BETWEEN ...`` form would plan as a nested-loop.
    """
    ev = tables(spark, sf_dir).events
    bucket = lambda c: F.floor(_epoch_us(c) / (_RANGE_SECONDS * 1_000_000))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("p_ts"),
        bucket(F.col("ts")).alias("bucket"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("c_ts"),
            F.explode(
                F.array(bucket(F.col("ts")), bucket(F.col("ts")) + 1)
            ).alias("bucket"),
        )
    )
    joined = purchases.join(clicks, ["user_id", "bucket"], "left").withColumn(
        "hit",
        (
            (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {_RANGE_SECONDS} SECOND"))
            & (F.col("c_ts") <= F.col("p_ts"))
        ).cast("int"),
    )
    return (
        joined.groupBy("event_id")
        .agg(F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_recent_clicks"))
        .orderBy("event_id")
    )
