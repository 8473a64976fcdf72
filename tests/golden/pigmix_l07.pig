-- PigMix L7 port (L7.pig — nested SPLIT shape: one grouped bag feeding
-- several filtered aggregates, the morning/afternoon idiom).
a = LOAD '$sf/events.parquet';
b = FOREACH a GENERATE user_id, value;
c = GROUP b BY user_id;
d = FOREACH c {
    morning = FILTER b BY value < 150.0;
    afternoon = FILTER b BY value >= 150.0;
    GENERATE group AS uid, COUNT(morning) AS n_am, COUNT(afternoon) AS n_pm;
};
out = ORDER d BY uid;
