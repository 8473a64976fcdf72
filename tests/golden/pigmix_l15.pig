-- PigMix L15 port (L15.pig — several distinct-aggregates in ONE
-- FOREACH; compiles to Catalyst's expand + two-phase count_distinct,
-- no bag materialization).
a = LOAD '$sf/orders.parquet';
b = GROUP a BY o_orderpriority;
c = FOREACH b {
    dc = DISTINCT a.o_custkey;
    ds = DISTINCT a.o_orderstatus;
    GENERATE group AS prio, COUNT(dc) AS n_cust, COUNT(ds) AS n_status;
};
out = ORDER c BY prio;
