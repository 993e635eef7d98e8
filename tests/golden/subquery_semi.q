-- mirrors clientpositive/subquery_in.q
SELECT n_name FROM nation
WHERE n_nationkey IN (SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)
