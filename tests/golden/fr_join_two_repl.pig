-- FRJoin with TWO replicated inputs in ONE n-way statement (reference
-- analog pig:…/POFRJoin: fragment = first input, every other input
-- replicated/broadcast): customer is the fragment; supplier and nation
-- both broadcast
c = LOAD '$sf/customer.parquet';
s = LOAD '$sf/supplier.parquet';
n = LOAD '$sf/nation.parquet';
j = JOIN c BY c_nationkey, s BY s_nationkey, n BY n_nationkey USING 'replicated';
g = GROUP j BY n_name;
a = FOREACH g GENERATE group AS nation, COUNT(j) AS n_pairs,
                       MIN(j.c_custkey) AS min_cust;
out = ORDER a BY nation;
