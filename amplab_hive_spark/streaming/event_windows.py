"""Event-time windowed aggregation over the events table.

Reference parity (SURVEY.md §2.8): the reference is batch-only — its
single streaming surface is transactional micro-batch ingest
(hcatalog/streaming TransactionBatch.java / HiveEndPoint.java),
covered by streaming/ingest.py. Event-time windows, sessionization
and watermarks are the Structured Streaming superset we add on top;
the same F.window / F.session_window expressions run identically in
batch mode (tested here against a SQL oracle) and under readStream
(tested in tests/test_streaming_ingest.py with a watermark).

Scale: windowed aggregation shuffles on (window, key) — bounded
cardinality; session_window uses Spark's native session merge, and
under streaming, state is bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.operators._util import o_dsum
from amplab_hive_spark.registry import register


@register(
    "events_tumbling_window",
    tags=("streaming", "window-agg"),
    oracle=f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {o_dsum('value', scale=2)} AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows — F.window, the same
    expression a readStream pipeline uses."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sliding_window",
    tags=("streaming", "window-agg"),
    oracle="""
WITH starts AS (
  SELECT e.event_id, e.event_type,
         time_bucket(INTERVAL '30 minutes', e.ts) - k * INTERVAL '30 minutes' AS window_start
  FROM events e, unnest([0, 1]) AS t(k)
  WHERE e.ts < time_bucket(INTERVAL '30 minutes', e.ts) - k * INTERVAL '30 minutes'
               + INTERVAL '1 hour'
)
SELECT window_start, event_type, COUNT(*) AS n_events
FROM starts
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): each event lands
    in 2 windows. The oracle reconstructs the window assignment
    arithmetic explicitly."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sessionization",
    bench=True,
    tags=("streaming", "session"),
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '5 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
),
islands AS (
  -- (ts, event_id) — the SAME total order as the gaps window. With
  -- ts alone, tied timestamps at a session boundary could place the
  -- is_new_session=0 twin BEFORE the =1 row in this ROWS frame,
  -- assigning it to the previous session, where Spark's
  -- session_window always merges same-ts events into one session.
  SELECT user_id, ts,
         SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
  FROM gaps
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM islands
GROUP BY user_id, session_no
ORDER BY user_id, session_start
""",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute inactivity gap) via Spark's native
    session_window — the reference has no equivalent at all. The
    oracle derives identical sessions with gaps-and-islands SQL."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        .orderBy("user_id", "session_start")
    )


@register(
    "events_rate_per_user",
    tags=("streaming", "agg"),
    oracle=f"""
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       {o_dsum('value', scale=2)} AS total_value,
       CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS active_seconds
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def events_rate_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity rollup on the stream table (span, volume,
    type diversity)."""
    t = tables(spark, sf_dir)
    span = F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
    return (
        t.events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.sum(F.col("value").cast("decimal(38,2)")).cast("double").alias("total_value"),
            span.cast("bigint").alias("active_seconds"),
        )
        .orderBy("user_id")
    )


@register(
    "events_funnel",
    tags=("streaming", "funnel"),
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            ELSE 1 END AS reached_stage
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
ORDER BY v.user_id
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): each
    stage's timestamp must strictly follow the previous stage's.
    Three conditional min-aggregations chained by user_id joins —
    the classic product-analytics query the reference would express
    as repeated self-joins (no MATCH_RECOGNIZE in Hive 1.2; cf. the
    matchpath PTF for the regex-style variant).

    Scale: each stage is one groupBy(user_id) over a
    predicate-pruned slice of events, and the stage tables are
    per-user (tiny vs the event log) — joins broadcast. Shuffle
    cost ~= 3 filtered scans keyed by user, no self-join of the
    full log against itself."""
    t = tables(spark, sf_dir)
    e = t.events
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.join(c, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .otherwise(1)
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase", stage.alias("reached_stage"))
        .orderBy("user_id")
    )


@register(
    "events_burst_detection",
    tags=("streaming", "window-agg"),
    oracle="""
WITH hourly AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, COUNT(*) AS n
  FROM events GROUP BY 1
),
with_prev AS (
  SELECT window_start, n,
         LAG(n) OVER (ORDER BY window_start) AS prev_n
  FROM hourly
)
SELECT window_start, n, prev_n,
       CAST(n AS DOUBLE) / prev_n AS burst_ratio
FROM with_prev
WHERE prev_n IS NOT NULL AND n > prev_n * 1.5
ORDER BY window_start
""",
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burst detection: hourly windows whose event count
    jumps >1.5x over the previous hour — the alerting query every
    event pipeline runs (rate-anomaly over consecutive windows,
    lag comparison like the reference would spell with a self-join;
    cf. PTFOperator lag at QL/exec/PTFOperator.java:46).

    Scale: one tumbling-window agg (shuffle on window key) collapses
    the log to #windows rows; the LAG pass runs on that tiny series.
    Under readStream the same window agg runs incrementally and the
    comparison joins consecutive finalized windows."""
    t = tables(spark, sf_dir)
    hourly = (
        t.events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    w = Window.orderBy("window_start")
    return (
        hourly.withColumn("prev_n", F.lag("n").over(w))
        .filter(F.col("prev_n").isNotNull() & (F.col("n") > F.col("prev_n") * 1.5))
        .select(
            "window_start", "n", "prev_n",
            (F.col("n").cast("double") / F.col("prev_n")).alias("burst_ratio"),
        )
        .orderBy("window_start")
    )


@register(
    "events_retention_cohorts",
    tags=("streaming", "analytics"),
    oracle="""
WITH weekly AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
),
cohorted AS (
  SELECT user_id, week,
         MIN(week) OVER (PARTITION BY user_id) AS cohort_week
  FROM weekly
)
SELECT cohort_week,
       (date_diff('day', cohort_week, week) // 7) AS week_offset,
       COUNT(*) AS n_users
FROM cohorted
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the week of
    their first event, and each cell counts how many of a cohort's
    users were active N weeks later — the activation/retention matrix
    every product-analytics stack derives from the raw event log.

    Plan shape (verified via explain): one column-pruned scan of the
    log, and the DISTINCT's map-side partial aggregate collapses each
    input partition to its local (user_id, week) set BEFORE the first
    exchange — so at 100 TB the only full-width pass is the scan, and
    every shuffle (distinct finalize, the window's hash(user_id)
    exchange, the cell groupBy) moves only the collapsed
    #users x #weeks frame. A repartition(user_id)-first spelling
    would merge the distinct and window exchanges into one but shuffle
    the UNcollapsed log, which is strictly worse. Counting rows of
    the distinct frame == COUNT(DISTINCT user) per cell, with no
    second distinct needed; a groupBy-min + self-join spelling would
    scan and shuffle the log twice."""
    t = tables(spark, sf_dir)
    weekly = t.events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    cohorted = weekly.withColumn(
        "cohort_week", F.min("week").over(Window.partitionBy("user_id"))
    )
    return (
        cohorted.groupBy(
            "cohort_week",
            F.floor(F.datediff("week", "cohort_week") / 7).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "events_path_transitions",
    tags=("streaming", "analytics"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
FROM seq
WHERE next_type IS NOT NULL
GROUP BY 1, 2
ORDER BY from_type, to_type
""",
)
def events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: for every user's time-ordered
    stream, count (from_type -> to_type) adjacent pairs across the
    whole log — the Markov-chain path analysis behind funnels and
    next-action models (the reference spells per-row successor access
    with its windowing PTF, ql/exec/PTFOperator.java:46; lead() is
    the same operator).

    Ordering within a user is (ts, event_id): event_id is unique, so
    the LEAD pass is deterministic even when two events share a
    timestamp. Scale shape: one hash(user_id) exchange for the window
    (each user's stream sorts locally within its partition), then the
    transition groupBy collapses map-side to the #types^2 matrix —
    the second shuffle carries at most |types|^2 rows per partition.
    All-integer output, no floats to diverge cross-engine."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )
