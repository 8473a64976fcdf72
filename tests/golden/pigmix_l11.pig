-- PigMix L11 port (L11.pig — UNION of two projected relations then
-- DISTINCT).
a = LOAD '$sf/events.parquet';
b = FOREACH a GENERATE user_id AS k;
c = LOAD '$sf/orders.parquet';
d = FOREACH c GENERATE o_custkey % 20 AS k;
e = UNION b, d;
f = DISTINCT e;
out = ORDER f BY k;
