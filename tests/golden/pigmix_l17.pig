-- PigMix L17 port (L17.pig — wide (multi-part) group keys).
a = LOAD '$sf/lineitem.parquet';
b = GROUP a BY (l_returnflag, l_linestatus, l_shipdate, l_linenumber);
c = FOREACH b GENERATE group.l_returnflag AS rf, group.l_linestatus AS ls,
        (chararray)group.l_shipdate AS sd, group.l_linenumber AS ln,
        COUNT(a) AS n, ROUND(SUM(a.l_quantity)) AS qty;
d = FILTER c BY n > 1;
out = ORDER d BY rf, ls, sd, ln;
