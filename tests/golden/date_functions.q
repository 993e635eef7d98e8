-- date/time function family (FunctionRegistry.java:252-268)
SELECT o_orderkey,
       year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
       weekofyear(o_orderdate) AS wk,
       date_add(CAST(o_orderdate AS DATE), 31) AS plus31,
       last_day(o_orderdate) AS eom,
       datediff(CAST('1996-06-30' AS DATE), CAST(o_orderdate AS DATE)) AS dd
FROM orders
WHERE o_orderkey % 2003 = 42
