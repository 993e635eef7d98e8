-- grouping sets output feeding a window function (PTF over GBY)
SELECT st, prio, cnt,
       RANK() OVER (PARTITION BY st ORDER BY cnt DESC, prio) AS rk
FROM (SELECT o_orderstatus AS st, o_orderpriority AS prio, COUNT(*) AS cnt
      FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)) g
WHERE st IS NOT NULL AND prio IS NOT NULL
