-- as-of semantics via union-marker window over events (operators/asof.py's SQL-surface twin)
SELECT event_id, user_id, click_ts
FROM (
  SELECT event_id, user_id, side, ev_ts,
         MAX(CASE WHEN side = 0 THEN ev_ts END)
           OVER (PARTITION BY user_id ORDER BY ev_ts, side
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
  FROM (
    SELECT event_id, user_id, 1 AS side, ts AS ev_ts FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, user_id, 0 AS side, ts AS ev_ts FROM events WHERE event_type = 'click'
  ) u
) m
WHERE side = 1 AND event_id % 7 = 0
ORDER BY event_id
