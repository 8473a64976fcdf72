-- PigMix L6 port (L6.pig — group on expression-derived keys, COUNT and
-- SUM per group).
a = LOAD '$sf/lineitem.parquet';
b = FOREACH a GENERATE (l_quantity > 25.0 ? 1 : 0) AS big_qty,
        l_orderkey % 10 AS okmod, ROUND(l_extendedprice) AS price_r;
c = GROUP b BY (big_qty, okmod);
d = FOREACH c GENERATE group.big_qty AS big_qty, group.okmod AS okmod,
        COUNT(b) AS n, SUM(b.price_r) AS tot;
out = ORDER d BY big_qty, okmod;
