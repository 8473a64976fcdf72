-- PigMix L10 port (L10.pig — ORDER BY multiple keys with mixed
-- directions).
a = LOAD '$sf/orders.parquet';
b = FOREACH a GENERATE o_orderpriority, o_totalprice, o_orderkey;
out = ORDER b BY o_orderpriority ASC, o_totalprice DESC, o_orderkey;
