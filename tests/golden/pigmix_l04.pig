-- PigMix L4 port (L4.pig — per-group DISTINCT then COUNT, the
-- nested-FOREACH idiom verbatim: project the bag column, DISTINCT it,
-- COUNT the result).
a = LOAD '$sf/events.parquet';
b = FOREACH a GENERATE user_id, event_type;
c = GROUP b BY user_id;
d = FOREACH c {
    aleph = b.event_type;
    beth = DISTINCT aleph;
    GENERATE group AS uid, COUNT(beth) AS n_actions;
};
out = ORDER d BY uid;
