-- FLATTEN(map) -> key/value rows; map built with TOMAP
e = LOAD '$sf/events.parquet';
lim = LIMIT e 5;
kv = FOREACH lim GENERATE event_id, FLATTEN(TOMAP('uid', user_id, 'double_uid', user_id * 2));
out = ORDER kv BY event_id, key;
