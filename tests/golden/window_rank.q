-- mirrors clientpositive/windowing.q
SELECT c_mktsegment, c_custkey, r FROM (
  SELECT c_mktsegment, c_custkey,
         RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS r
  FROM customer
) t WHERE r <= 3
