-- PigMix L12 port (L12.pig — SPLIT + multi-STORE of one scan, then a
-- per-side rollup so the golden checks both branches).
a = LOAD '$sf/orders.parquet';
SPLIT a INTO hi IF o_totalprice >= 200000.0, lo OTHERWISE;
rmf /tmp/golden_pigmix_l12_hi;
rmf /tmp/golden_pigmix_l12_lo;
STORE hi INTO '/tmp/golden_pigmix_l12_hi';
STORE lo INTO '/tmp/golden_pigmix_l12_lo';
gh = GROUP hi BY o_orderpriority;
h = FOREACH gh GENERATE group AS prio, 'hi' AS side, COUNT(hi) AS n;
gl = GROUP lo BY o_orderpriority;
l = FOREACH gl GENERATE group AS prio, 'lo' AS side, COUNT(lo) AS n;
u = UNION h, l;
out = ORDER u BY prio, side;
