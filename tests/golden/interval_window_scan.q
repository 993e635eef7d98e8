-- INTERVAL arithmetic in predicates over event time (reference: timestamp literal/interval grammar, HiveParser.g)
SELECT event_type, COUNT(*) AS n
FROM events
WHERE ts > TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 2 DAY
  AND ts <= TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 9 DAY
GROUP BY event_type
ORDER BY event_type
