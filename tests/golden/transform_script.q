-- ScriptOperator surface: SELECT TRANSFORM ... USING external command
-- (ql/exec/ScriptOperator.java:62); identity script + aggregation
SELECT k AS l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(CAST(q AS BIGINT) AS DECIMAL(38,0))) AS BIGINT) AS total_qty
FROM (
  SELECT TRANSFORM (l_returnflag, CAST(l_quantity AS BIGINT))
    USING '/bin/cat' AS (k STRING, q STRING)
  FROM lineitem
)
GROUP BY k
