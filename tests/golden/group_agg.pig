-- Group/aggregate family: fused groupBy, multiple aggs
o = LOAD '$sf/orders.parquet';
g = GROUP o BY o_orderstatus;
a = FOREACH g GENERATE group AS status, COUNT(o) AS n,
                       MIN(o.o_totalprice) AS mn, MAX(o.o_totalprice) AS mx;
out = ORDER a BY status;
