-- Hive default NULL sort order: NULLS FIRST asc, NULLS LAST desc (SURVEY §7.3)
SELECT k, cnt FROM (
  SELECT NULLIF(o_orderstatus, 'P') AS k, COUNT(*) AS cnt
  FROM orders GROUP BY NULLIF(o_orderstatus, 'P')
) t
ORDER BY k
