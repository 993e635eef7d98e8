-- DISTRIBUTE BY + SORT BY parse and execute (TOK_DISTRIBUTEBY area, HiveParser.g:86);
-- output row-sort-normalized so per-reducer order is invisible, like SortPrintStream
SELECT c_nationkey, COUNT(*) AS n
FROM customer
GROUP BY c_nationkey
DISTRIBUTE BY c_nationkey SORT BY c_nationkey
