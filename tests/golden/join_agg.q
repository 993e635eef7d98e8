-- mirrors clientpositive/auto_join1.q: join + aggregate
SELECT r_name, COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
