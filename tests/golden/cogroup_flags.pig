-- COGROUP per-input INNER/OUTER flags (SURVEY.md §2.1 #8; reference
-- analog pig:…/logicalLayer/LOCogroup inner flags): INNER drops groups
-- whose bag from that input is empty, OUTER keeps them — here nations
-- under key 3 INNER against all regions OUTER, so only region keys
-- with a matching filtered nation survive
r = LOAD '$sf/region.parquet';
n = LOAD '$sf/nation.parquet';
filt = FILTER n BY n_nationkey < 3;
cg = COGROUP filt BY n_regionkey INNER, r BY r_regionkey OUTER;
proj = FOREACH cg GENERATE group AS k, COUNT_STAR(filt) AS n_f,
                           COUNT_STAR(r) AS n_r;
out = ORDER proj BY k;
