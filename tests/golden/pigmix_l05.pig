-- PigMix L5 port (L5.pig — anti-join via COGROUP + empty-bag filter):
-- customers with no large order.
a = LOAD '$sf/orders.parquet';
b = LOAD '$sf/customer.parquet';
big = FILTER a BY o_totalprice > 250000.0;
c = COGROUP b BY c_custkey, big BY o_custkey;
d = FILTER c BY COUNT(big) == 0;
e = FOREACH d GENERATE group AS cust;
out = ORDER e BY cust;
