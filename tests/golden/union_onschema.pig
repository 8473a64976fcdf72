-- UNION ONSCHEMA: merge by column name, missing columns null-padded
r = LOAD '$sf/region.parquet';
n = LOAD '$sf/nation.parquet';
rn = FOREACH r GENERATE r_name AS name, 'region' AS src;
nn = FOREACH n GENERATE n_name AS name, n_regionkey AS rkey;
u = UNION ONSCHEMA rn, nn;
out = ORDER u BY name, src;
