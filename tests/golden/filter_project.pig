-- FilterEval-family case (nightly.conf shape): compound predicate + expressions
li = LOAD '$sf/lineitem.parquet';
f = FILTER li BY l_quantity >= 49.0 AND l_returnflag matches '[AR]';
p = FOREACH f GENERATE l_orderkey, l_linenumber,
                       l_quantity * (1.0 - l_discount) AS net;
out = ORDER p BY l_orderkey, l_linenumber;
