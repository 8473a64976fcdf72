-- nested FOREACH block: inner FILTER + ORDER + LIMIT
o = LOAD '$sf/orders.parquet';
g = GROUP o BY o_orderpriority;
r = FOREACH g {
    big = FILTER o BY o_totalprice > 200000.0;
    srt = ORDER o BY o_totalprice DESC;
    top = LIMIT srt 1;
    GENERATE group AS prio, COUNT(big) AS n_big, MAX(top.o_totalprice) AS best;
};
out = ORDER r BY prio;
