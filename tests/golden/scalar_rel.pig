-- scalar-of-relation (SURVEY.md §2.2): global average used per-row
o = LOAD '$sf/orders.parquet';
g = GROUP o ALL;
avgp = FOREACH g GENERATE AVG(o.o_totalprice) AS ap;
big = FILTER o BY o_totalprice > 1.9 * avgp.ap;
prj = FOREACH big GENERATE o_orderkey, o_totalprice;
out = ORDER prj BY o_orderkey;
