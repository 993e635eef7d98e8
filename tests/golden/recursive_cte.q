-- WITH RECURSIVE through the engine's SQL surface (Spark >= 4.0
-- evaluates recursive CTEs natively; the DuckDB-oracled twin shapes
-- live in tests/test_qscripts.py QSCRIPTS_R15). A generated 0..4
-- series drives a per-region rollup, and a halving chain seeded at
-- 24 selects its reachable nation keys.
WITH RECURSIVE series(n) AS (
  SELECT 0
  UNION ALL
  SELECT n + 1 FROM series WHERE n < 4
),
reach(k) AS (
  SELECT 24
  UNION ALL
  SELECT CAST(FLOOR(k / 2) AS INT) FROM reach WHERE k > 0
)
SELECT 'region_' || s.n AS row_key, CAST(COUNT(*) AS STRING) AS val
FROM series s JOIN nation ON n_regionkey = s.n
GROUP BY s.n
UNION ALL
SELECT 'reach_' || n_nationkey, n_name
FROM nation WHERE n_nationkey IN (SELECT k FROM reach)
ORDER BY row_key
