-- PigMix L8 port (L8.pig — GROUP ALL global aggregate: one COUNT + SUMs).
a = LOAD '$sf/lineitem.parquet';
b = GROUP a ALL;
out = FOREACH b GENERATE COUNT(a) AS n, ROUND(SUM(a.l_quantity)) AS qty,
        ROUND(SUM(a.l_extendedprice) * 100.0) AS cents;
