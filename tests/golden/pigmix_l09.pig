-- PigMix L9 port (L9.pig — total ORDER BY a single key with PARALLEL,
-- the sampled range-partition sort; unique tiebreak added so the
-- golden is deterministic).
a = LOAD '$sf/events.parquet';
b = FOREACH a GENERATE event_id, event_type, value;
out = ORDER b BY event_type, event_id PARALLEL 4;
