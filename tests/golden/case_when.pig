-- CASE WHEN + DISTINCT family
li = LOAD '$sf/lineitem.parquet';
t = FOREACH li GENERATE l_returnflag,
        (CASE WHEN l_quantity >= 25.0 THEN 'big' ELSE 'small' END) AS bucket;
d = DISTINCT t;
out = ORDER d BY l_returnflag, bucket;
