-- Mixed grouping clauses: CUBE x ROLLUP -> grouping sets cross product
li = LOAD '$sf/lineitem.parquet';
c = CUBE li BY CUBE(l_returnflag), ROLLUP(l_linestatus);
p = FOREACH c GENERATE group.l_returnflag AS rf, group.l_linestatus AS ls,
                       COUNT(li) AS n;
out = ORDER p BY rf, ls, n;
