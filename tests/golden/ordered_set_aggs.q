-- ordered-set aggregate surface through the engine: WITHIN GROUP
-- median alongside plain aggregates and a share-of-total window
-- over the aggregate output (windowing_gby family + the modern
-- percentile_cont grammar the engine must accept).
SELECT o_orderstatus,
       COUNT(*) AS n,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY o_orderkey) AS med_key,
       CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS share
FROM orders
WHERE o_orderkey <= 2000
GROUP BY o_orderstatus
