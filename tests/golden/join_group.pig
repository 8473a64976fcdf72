-- Join family: replicated join + group
c = LOAD '$sf/customer.parquet';
n = LOAD '$sf/nation.parquet';
j = JOIN c BY c_nationkey, n BY n_nationkey USING 'replicated';
g = GROUP j BY n_name;
a = FOREACH g GENERATE group AS nation, COUNT(j) AS n_cust;
out = ORDER a BY nation;
