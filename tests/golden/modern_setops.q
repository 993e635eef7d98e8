-- round-5 tranche surface through the engine: EXCEPT ALL bag
-- semantics (runs, result feeds the session), then GROUP BY ALL
-- over a join with an ILIKE probe as the rendered statement —
-- mirrors clientpositive groupby_position.q + setop families
-- re-spelled in the modern portable syntax the engine must accept.
SELECT v, COUNT(*) AS times FROM (
  SELECT n_regionkey AS v FROM nation
  EXCEPT ALL
  SELECT r_regionkey FROM region
) t GROUP BY v;
SELECT band, r_name, COUNT(*) AS n FROM (
  SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
              WHEN c_acctbal < 5000 THEN 'mid'
              ELSE 'high' END AS band,
         c_nationkey
  FROM customer
  WHERE c_mktsegment ILIKE 'bui%'
) c
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ALL
