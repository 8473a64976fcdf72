-- Project-range syntax (Pig 0.9 "project-range"): name..name, $n.., ..name
n = LOAD '$sf/nation.parquet';
a = FOREACH n GENERATE n_nationkey .. n_name, 1 AS tag;
b = FOREACH a GENERATE $0 .., 'x' AS src;
out = ORDER b BY n_nationkey;
