-- COGROUP + IsEmpty anti-join idiom (SURVEY.md §2.1 #15): regions with
-- no nation with key < 3 — bags inspected per group
r = LOAD '$sf/region.parquet';
n = LOAD '$sf/nation.parquet';
filt = FILTER n BY n_nationkey < 3;
cg = COGROUP r BY r_regionkey, filt BY n_regionkey;
proj = FOREACH cg GENERATE group AS rkey, COUNT_STAR(r) AS n_regions,
                           COUNT_STAR(filt) AS n_matched,
                           (IsEmpty(filt) ? 1 : 0) AS is_anti;
out = ORDER proj BY rkey;
