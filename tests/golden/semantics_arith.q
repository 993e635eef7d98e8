-- Hive dialect arithmetic (non-ANSI): see functions/semantics.py
SELECT l_linenumber,
       l_linenumber / 4 AS div_true,
       l_linenumber div 4 AS div_floor,
       pmod(3 - l_linenumber, 5) AS pm,
       '3' + l_linenumber AS implicit_cast
FROM lineitem
WHERE l_orderkey = (SELECT MIN(l_orderkey) FROM lineitem)
