-- PigMix L1 port (pig:test/perf/pigmix L1.pig — explode a nested
-- bag field, conditional map access, group + count per user). The
-- page_views map/bag columns are built inline with TOMAP/TOBAG over
-- the events fixture; same operator shape: FOREACH(map,bag build) ->
-- FLATTEN(bag) -> bincond map#key -> GROUP -> COUNT.
a = LOAD '$sf/events.parquet';
b = FOREACH a GENERATE user_id, event_type,
        TOMAP('a', value, 'b', value * 2.0) AS page_info,
        FLATTEN(TOBAG(value, value + 1.0)) AS page_links;
c = FOREACH b GENERATE user_id,
        (event_type == 'click' ? page_info#'a' : page_links) AS header;
d = GROUP c BY user_id;
e = FOREACH d GENERATE group AS uid, COUNT(c) AS cnt,
        ROUND(SUM(c.header) * 100.0) AS header_cents;
out = ORDER e BY uid;
