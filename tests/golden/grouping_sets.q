-- grouping sets + grouping_id virtual column (GroupByDesc.java:63, HiveParser.g:79-80)
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) AS g_status,
       grouping(o_orderpriority) AS g_prio,
       COUNT(*) AS cnt
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
