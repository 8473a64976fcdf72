-- COGROUP + inner CROSS of the two cogrouped bags: per-key cartesian
-- cardinality == product of per-key counts; null-safe key grouping.
n = LOAD '$sf/nation.parquet';
s = LOAD '$sf/supplier.parquet';
cg = COGROUP n BY n_regionkey, s BY (s_nationkey % 5);
x = FOREACH cg { p = CROSS n, s;
                 GENERATE group AS k, COUNT_STAR(p) AS n_pairs,
                          COUNT_STAR(n) AS n_nations,
                          COUNT_STAR(s) AS n_supps; };
out = ORDER x BY k;
