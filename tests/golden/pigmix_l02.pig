-- PigMix L2 port (L2.pig — fragment-replicate join of the big table
-- against a small user table): events x customer USING 'replicated',
-- then a grouped rollup so the golden stays small.
a = LOAD '$sf/events.parquet';
b = LOAD '$sf/customer.parquet';
c = JOIN a BY user_id, b BY c_custkey USING 'replicated';
d = FOREACH c GENERATE user_id AS uid, c_mktsegment AS seg, value;
e = GROUP d BY (uid, seg);
f = FOREACH e GENERATE group.uid AS uid, group.seg AS seg,
        COUNT(d) AS n, ROUND(SUM(d.value) * 100.0) AS cents;
out = ORDER f BY uid;
