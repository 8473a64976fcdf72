-- FLATTEN-then-JOIN: the compiler defers the explode below the inner join
-- (PushDownForEachFlatten) — results identical to eager explode.
o = LOAD '$sf/orders.parquet';
c = LOAD '$sf/customer.parquet';
fe = FOREACH o GENERATE o_custkey, FLATTEN(TOKENIZE(o_orderpriority)) AS tok;
j = JOIN fe BY o_custkey, c BY c_custkey;
g = GROUP j BY (c_mktsegment, tok);
agg = FOREACH g GENERATE FLATTEN(group) AS (seg, tok), COUNT_STAR(j) AS cnt;
out = ORDER agg BY seg, tok;
