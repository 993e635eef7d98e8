-- view-over-view resolution (DDLSemanticAnalyzer CREATEVIEW)
CREATE OR REPLACE TEMPORARY VIEW big_orders_v AS
SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 300000;
CREATE OR REPLACE TEMPORARY VIEW big_by_cust_v AS
SELECT o_custkey, COUNT(*) AS n_big, MAX(o_totalprice) AS top_price
FROM big_orders_v GROUP BY o_custkey;
SELECT c_mktsegment, COUNT(*) AS n_cust,
       CAST(SUM(n_big) AS BIGINT) AS n_orders
FROM big_by_cust_v JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
