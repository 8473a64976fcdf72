-- FLATTEN(map) -> key/value rows; map built with TOMAP. The 5-row
-- subset is keyed (event_id < 5), not a bare LIMIT: LIMIT without
-- ORDER is spec-nondeterministic, and on the 16-file sf1 directory
-- the engine's first-partition rows differ from DuckDB's glob-order
-- rows (caught by the sf1 --check).
e = LOAD '$sf/events.parquet';
lim = FILTER e BY event_id < 5;
kv = FOREACH lim GENERATE event_id, FLATTEN(TOMAP('uid', user_id, 'double_uid', user_id * 2));
out = ORDER kv BY event_id, key;
