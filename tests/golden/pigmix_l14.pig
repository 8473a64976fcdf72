-- PigMix L14 port (L14.pig — sort-merge join on pre-organized inputs:
-- USING 'merge' pins the SMJ strategy).
a = LOAD '$sf/orders.parquet';
b = LOAD '$sf/customer.parquet';
c = JOIN a BY o_custkey, b BY c_custkey USING 'merge';
d = GROUP c BY c_mktsegment;
e = FOREACH d GENERATE group AS seg, COUNT(c) AS n,
        ROUND(SUM(c.o_totalprice) * 100.0) AS cents;
out = ORDER e BY seg;
