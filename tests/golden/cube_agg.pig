-- CUBE family: grouping-sets aggregation over two dims
o = LOAD '$sf/orders.parquet';
c = CUBE o BY CUBE(o_orderstatus, o_orderpriority);
a = FOREACH c GENERATE group.o_orderstatus AS status,
                       group.o_orderpriority AS prio, COUNT(o) AS n;
out = ORDER a BY status, prio;
