-- macro DDL + use in the same script (MacroSemanticAnalyzer surface)
CREATE TEMPORARY MACRO disc_price(p DECIMAL, d DECIMAL) p * (1 - d);
SELECT l_returnflag,
       CAST(SUM(CAST(disc_price(CAST(l_extendedprice AS DECIMAL(18,2)),
                                CAST(l_discount AS DECIMAL(6,2))) AS DECIMAL(38,4))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY l_returnflag
