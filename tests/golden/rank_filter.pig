-- RANK family: RANK BY DESC + filter on the rank column
o = LOAD '$sf/orders.parquet';
r = RANK o BY o_totalprice DESC;
f = FILTER r BY rank_o <= 5;
p = FOREACH f GENERATE rank_o, o_orderkey, o_totalprice;
out = ORDER p BY rank_o;
