-- the events_path_transitions operator surface as engine SQL: the
-- per-user LEAD() successor (PTFOperator windowing) folded into the
-- global (from_type -> to_type) Markov transition matrix, restricted
-- to the busiest event types so the golden stays review-sized.
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
FROM seq
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
HAVING COUNT(*) >= 10
