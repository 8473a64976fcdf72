-- n-way JOIN in one statement (all inputs on one key)
c = LOAD '$sf/customer.parquet';
s = LOAD '$sf/supplier.parquet';
n = LOAD '$sf/nation.parquet';
j = JOIN c BY c_nationkey, s BY s_nationkey, n BY n_nationkey;
g = GROUP j BY n_name;
a = FOREACH g GENERATE group AS nation, COUNT(j) AS n_pairs;
out = ORDER a BY nation;
