-- Weekly cohort retention in pure SQL — the golden twin of
-- streaming/event_windows.py events_retention_cohorts: collapse the
-- log to DISTINCT (user, week), cohort each user by window MIN, and
-- count active users per (cohort, offset) cell. The operator's
-- DuckDB oracle proves cross-engine correctness; this golden pins
-- the SQL-surface spelling against regressions.
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
       CAST(floor(datediff(week, cohort_week) / 7) AS BIGINT) AS week_offset,
       COUNT(*) AS n_users
FROM cohorted
GROUP BY cohort_week, floor(datediff(week, cohort_week) / 7)
ORDER BY cohort_week, week_offset
