-- PigMix L8 port (L8.pig — GROUP ALL global aggregate: one COUNT + SUMs).
-- Money sums go through per-row exact cents (ROUND to long BEFORE the
-- SUM): summing the raw doubles is order-sensitive at +-1 ulp once the
-- total crosses ~2^45 (caught by the sf1 --check: engine and DuckDB
-- disagreed by one cent in 3.2e11 dollars), while integer cents sum
-- exactly at any scale.
a = LOAD '$sf/lineitem.parquet';
p = FOREACH a GENERATE l_quantity, ROUND(l_extendedprice * 100.0) AS cents;
b = GROUP p ALL;
out = FOREACH b GENERATE COUNT(p) AS n, ROUND(SUM(p.l_quantity)) AS qty,
        SUM(p.cents) AS cents;
