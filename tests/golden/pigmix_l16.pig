-- PigMix L16 port (L16.pig — per-group inner ORDER (+LIMIT) then an
-- aggregate over the ordered prefix: top-3 spend per customer).
a = LOAD '$sf/orders.parquet';
b = GROUP a BY o_custkey;
c = FOREACH b {
    srt = ORDER a BY o_totalprice DESC, o_orderkey;
    top = LIMIT srt 3;
    GENERATE group AS cust, ROUND(SUM(top.o_totalprice) * 100.0) AS top3_cents;
};
out = ORDER c BY cust;
