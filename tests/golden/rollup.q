-- mirrors clientpositive/groupby_rollup1.q
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
