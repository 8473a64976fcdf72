-- Pig cast/arithmetic edge semantics in one script: int division
-- truncates toward zero, x/0 is null (no error), a failed cast is
-- null (no error), and `matches` anchors the full string.
n = LOAD '$sf/nation.parquet';
e = FOREACH n GENERATE n_nationkey,
        (n_nationkey - 30) / 7 AS intdiv,
        (n_nationkey / 0) AS divzero,
        (int)SUBSTRING(n_name, 0, 6) AS badcast,
        (n_name matches 'NATION_1.') AS m1;
out = ORDER e BY n_nationkey;
