-- PigMix L3 port (L3.pig — equi-join then group-aggregate with SUM).
a = LOAD '$sf/lineitem.parquet';
b = LOAD '$sf/orders.parquet';
c = JOIN a BY l_orderkey, b BY o_orderkey;
d = GROUP c BY o_orderpriority PARALLEL 4;
e = FOREACH d GENERATE group AS prio, COUNT(c) AS n,
        ROUND(SUM(c.l_extendedprice) * 100.0) AS cents;
out = ORDER e BY prio;
