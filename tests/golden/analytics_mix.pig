-- second nightly-shape mix: COGROUP + SIZE/IsEmpty + CUBE with null
-- dims + RANK BY DENSE + ASSERT + %declare arithmetic param, over two
-- tables, stitched through UNION ONSCHEMA.
%declare MINQTY 10;

c = LOAD '$sf/customer.parquet';
o = LOAD '$sf/orders.parquet';

-- COGROUP: customers with their orders; keep customers with >= 14
-- orders (~10 avg at sf0.001), project bag size and max price
cg = COGROUP c BY c_custkey, o BY o_custkey;
act = FILTER cg BY NOT IsEmpty(o) AND SIZE(o) >= 14;
per = FOREACH act GENERATE group AS cust, SIZE(o) AS n_ord,
                           MAX(o.o_totalprice) AS best;

-- RANK BY (dense): heaviest customers first
rk = RANK per BY n_ord DESC DENSE;
top = FILTER rk BY rank_per <= 2;

-- CUBE over order attributes, restricted by the %declare param
big = FILTER o BY o_totalprice >= $MINQTY * 10000.0;
cb = CUBE big BY CUBE(o_orderpriority, o_orderstatus);
cagg = FOREACH cb GENERATE group.o_orderpriority AS prio,
                           group.o_orderstatus AS status,
                           COUNT(big) AS n;
chot = FILTER cagg BY n > 150;

-- sanity contract mid-script (ASSERT passes: counts are positive)
ASSERT cagg BY n >= 0;

-- stitch both shapes into one output schema
t1 = FOREACH top GENERATE 'rank' AS kind, (chararray)cust AS k1,
                          (chararray)n_ord AS k2, (double)best AS val;
t2 = FOREACH chot GENERATE 'cube' AS kind,
                           (prio IS NULL ? 'ALL' : prio) AS k1,
                           (status IS NULL ? 'ALL' : status) AS k2,
                           (double)n AS val;
u = UNION ONSCHEMA t1, t2;
out = ORDER u BY kind, k1, k2;
