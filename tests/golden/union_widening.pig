-- plain UNION with mismatched numeric schemas: positional union widens
-- (long, double) -> double (SURVEY.md §2.1 #21 mismatched widening)
r = LOAD '$sf/region.parquet';
n = LOAD '$sf/nation.parquet';
a = FOREACH n GENERATE n_name AS name, n_nationkey AS v;
b = FOREACH r GENERATE r_name AS name, 0.5 AS v;
u = UNION a, b;
out = ORDER u BY name, v;
