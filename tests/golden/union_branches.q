-- mirrors clientpositive/union_remove_1.q
SELECT src, COUNT(*) AS cnt FROM (
  SELECT 'high_cust' AS src FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT 'high_supp' AS src FROM supplier WHERE s_acctbal > 9000
) u GROUP BY src
