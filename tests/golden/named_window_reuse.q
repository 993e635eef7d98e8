-- named WINDOW clause reused by several functions (reference: windowing_windowspec.q; PTFTranslator.java resolves named specs)
SELECT c_custkey,
       ROW_NUMBER() OVER w AS rn,
       LAG(c_custkey, 1) OVER w AS prv,
       LEAD(c_custkey, 1) OVER w AS nxt
FROM customer
WHERE c_custkey <= 60
WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
