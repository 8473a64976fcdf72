-- kitchen sink: params + twice-expanded macro + SPLIT/OTHERWISE +
-- GROUP-FOREACH fusion + UNION + FILTER + ORDER, all through the parser
%default CUT 200000.0;
DEFINE revenue_by(rel) RETURNS out {
    g = GROUP $rel BY o_custkey;
    $out = FOREACH g GENERATE group AS cust,
                              FLOOR(SUM($rel.o_totalprice) * 100.0 + 0.5)
                                  / 100.0 AS rev;
};
o = LOAD '$sf/orders.parquet';
SPLIT o INTO big IF o_totalprice >= $CUT, small OTHERWISE;
rb = revenue_by(big);
rs = revenue_by(small);
hb = FOREACH rb GENERATE cust, rev, 'big' AS src;
hs = FOREACH rs GENERATE cust, rev, 'small' AS src;
u = UNION hb, hs;
flt = FILTER u BY rev > 300000.0;
out = ORDER flt BY src, cust;
