"""Stream-stream interval join: click→purchase attribution.

The reference engine has no streaming surface at all (SURVEY §2.8's
closest analogue is micro-batch ingest); this is the Structured
Streaming twin of the BATCH banded range join in operators/asof.py —
same semantics ("clicks within the lookback window before each
purchase, per user"), expressed as a watermarked stream-stream join
instead of time banding.

Scale/state model: Spark buffers each side's rows in join state
keyed by user_id; BOTH watermarks plus the two-sided time-range
condition let the engine evict state older than
``watermark + lookback`` — without them a stream-stream join's state
grows forever. State volume ≈ events within one watermark horizon,
independent of stream lifetime; RocksDB-backed on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def click_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Pair every purchase with each same-user click in the
    ``lookback_minutes`` before it (inclusive upper bound, exclusive
    lower — identical to events_range_join's interval). Inner join:
    deterministic under availableNow (a left-outer's NULL rows are
    emitted only as the watermark passes, which a catch-up run may
    never reach).

    Cross-run caveat: the watermark persists in the checkpoint, so a
    SECOND run sees rows older than (max event time of run one -
    ``watermark``) as late and drops them — a late-arriving click can
    lose its pair even though a batch interval join over the same
    files would find it. The streamed-equals-batch invariant holds
    for data within the watermark allowance; size ``watermark`` to
    the source's real out-of-orderness."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    return p.join(
        c,
        F.expr(
            f"""
            user_id = c_user_id
            AND click_ts <= purchase_ts
            AND click_ts > purchase_ts - INTERVAL {lookback_minutes} MINUTES
            """
        ),
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


def run_attribution_stream(
    spark: SparkSession,
    purchases_dir: str,
    clicks_dir: str,
    checkpoint_dir: str,
    schema,
    out_dir: str,
    lookback_minutes: int = 10,
):
    """availableNow micro-batch run: file sources in, parquet out —
    the bounded-state, run-forever configuration (append output mode
    is the only mode stream-stream joins support)."""
    purchases = (
        spark.readStream.schema(schema)
        .parquet(purchases_dir)
        .filter(F.col("event_type") == "purchase")
    )
    clicks = (
        spark.readStream.schema(schema)
        .parquet(clicks_dir)
        .filter(F.col("event_type") == "click")
    )
    joined = click_attribution(purchases, clicks, lookback_minutes)
    return (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
