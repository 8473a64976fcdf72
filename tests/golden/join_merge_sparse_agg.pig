-- JOIN USING 'merge-sparse': sparse right side (few matching keys);
-- inner-join semantics, SMJ with a broadcast-semi prune plan-side.
a = LOAD '$sf/orders.parquet';
big = FILTER a BY o_totalprice > 300000.0;
c = LOAD '$sf/customer.parquet';
j = JOIN c BY c_custkey, big BY o_custkey USING 'merge-sparse';
p = FOREACH j GENERATE c_custkey AS cust, o_orderkey AS ok;
out = ORDER p BY cust, ok;
