-- JOIN USING 'skewed' (maps to AQE skew-join handling; semantics are
-- the plain inner join) + grouped rollup.
a = LOAD '$sf/lineitem.parquet';
b = LOAD '$sf/orders.parquet';
j = JOIN a BY l_orderkey, b BY o_orderkey USING 'skewed';
g = GROUP j BY o_orderstatus;
r = FOREACH g GENERATE group AS status, COUNT(j) AS n,
        ROUND(SUM(j.l_extendedprice) * 100.0) AS cents;
out = ORDER r BY status;
