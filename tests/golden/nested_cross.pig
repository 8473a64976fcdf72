-- nested FOREACH block: inner FOREACH projections, inner CROSS, per-pair
-- projection over the crossed bag, aggregates (Pig 0.13+ inner CROSS)
o = LOAD '$sf/orders.parquet';
g = GROUP o BY o_orderpriority;
x = FOREACH g {
    hv0 = FOREACH o GENERATE o_totalprice AS hv;
    hi = FILTER hv0 BY hv > 250000.0;
    lv0 = FOREACH o GENERATE o_totalprice AS lv;
    lo = FILTER lv0 BY lv < 5000.0;
    c = CROSS hi, lo;
    d = FOREACH c GENERATE hv - lv AS spread;
    GENERATE group AS pri, COUNT_STAR(c) AS n_pairs,
             MAX(d.spread) AS max_spread;
};
out = ORDER x BY pri;
