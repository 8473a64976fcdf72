-- PigMix L13 port (L13.pig — LEFT OUTER join, null-side handling).
a = LOAD '$sf/customer.parquet';
b = LOAD '$sf/orders.parquet';
big = FILTER b BY o_totalprice > 250000.0;
c = JOIN a BY c_custkey LEFT OUTER, big BY o_custkey;
d = FOREACH c GENERATE c_custkey AS cust,
        (o_orderkey IS NULL ? 0 : 1) AS has_big;
e = GROUP d BY cust;
f = FOREACH e GENERATE group AS cust, SUM(d.has_big) AS n_big;
out = ORDER f BY cust;
