-- SplitCombine family
o = LOAD '$sf/orders.parquet';
SPLIT o INTO hi IF o_totalprice > 300000.0, rest OTHERWISE;
h = FOREACH hi GENERATE o_orderkey, 'hi' AS tag;
r = FOREACH rest GENERATE o_orderkey, 'rest' AS tag;
u = UNION h, r;
f = FILTER u BY tag == 'hi';
out = ORDER f BY o_orderkey;
