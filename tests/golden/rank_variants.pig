-- RANK BY vs RANK BY ... DENSE over the same relation (ties share a
-- rank; DENSE closes the gaps). Values depend only on the key, so the
-- golden is deterministic under the unique orderkey sort.
o = LOAD '$sf/orders.parquet';
p = FOREACH o GENERATE o_orderpriority, o_orderkey;
r1 = RANK p BY o_orderpriority;
r2 = RANK p BY o_orderpriority DENSE;
f1 = FOREACH r1 GENERATE 'rank' AS kind, rank_p AS rnk, o_orderkey;
f2 = FOREACH r2 GENERATE 'dense' AS kind, rank_p AS rnk, o_orderkey;
u = UNION ONSCHEMA f1, f2;
out = ORDER u BY kind, o_orderkey;
