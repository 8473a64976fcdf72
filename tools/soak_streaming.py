"""Streaming-surface soak (round-6 item): run the stateful Structured
Streaming operators across many micro-batches with event time advancing
past the watermark, and record the STATE-STORE metrics per batch.

The claim under test is the one that kills long-running ingest jobs when
false: state is BOUNDED BY THE WATERMARK (old dedup keys / closed
windows / expired join buffers are dropped), so numRowsTotal plateaus
instead of growing with batch count. Each operator ingests batches whose
keys are globally unique per batch — without expiry, state would grow
linearly forever; with it, the tail of the series must be flat.

Covered (the three state shapes the engine's streaming surface uses):
- streaming_dedup            -> dropDuplicatesWithinWatermark key state
- tumbling + watermark,append-> windowed-aggregation state
- interval_join (stream-stream) -> two-sided join buffer state

Protocol: one CONTINUOUS query per operator (processingTime trigger),
a feeder appending one parquet file per tick with event time advancing
1 hour per batch against a 2-hour watermark; state sizes read from the
query's progress events. Verdict per operator: max(numRowsTotal over
the last third) <= max(over the middle third) * 1.25 — linear growth
fails, a plateau (with jitter) passes.

Writes SOAK_streaming_r06.json.
Usage: python tools/soak_streaming.py [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
BASE_TS = 1_700_000_000  # fixed epoch base; event time advances 1h/batch


def state_series(progresses):
    """(batch_id, total state rows) series from progress events."""
    out = []
    for p in progresses:
        ops = p.get("stateOperators") or []
        if ops and p.get("numInputRows", 0) >= 0:
            out.append((p["batchId"],
                        sum(op.get("numRowsTotal", 0) for op in ops)))
    return out


def plateau_ok(series):
    """Flat-tail check: last-third max within 1.25x of middle-third max."""
    if len(series) < 9:
        return False
    vals = [v for _, v in series]
    third = len(vals) // 3
    mid, tail = vals[third:2 * third], vals[2 * third:]
    return max(tail) <= max(mid) * 1.25 and max(mid) > 0


def main() -> None:
    import pyspark.sql.functions as F
    from spork_spark import get_spark
    from spork_spark.streaming import (interval_join, streaming_dedup,
                                       tumbling, with_watermark)

    spark = get_spark(master="local[8]", extra_conf={
        "spark.sql.shuffle.partitions": "8",
    })
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="spork-soak-stream-")

    def feed(dirname: str, batch: int, n_rows: int = 2000, key_off: int = 0):
        """One batch: globally-unique keys, event time = base + batch h."""
        (spark.range(n_rows)
              .select((F.col("id") + batch * 1_000_000 + key_off)
                      .alias("k"),
                      F.timestamp_seconds(
                          F.lit(BASE_TS + batch * 3600) + F.col("id") % 3600)
                      .alias("ts"),
                      (F.col("id") % 97).cast("double").alias("v"))
              .coalesce(1).write.mode("append")
              .parquet(os.path.join(root, dirname)))

    schema = "k bigint, ts timestamp, v double"

    def src(dirname: str):
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(os.path.join(root, dirname)))

    # seed each source so the streams can start
    for d in ("dedup", "win", "jl", "jr"):
        feed(d, 0)

    queries = {}

    dedup_df = streaming_dedup(src("dedup"), ["k"], "ts", delay="2 hours")
    queries["streaming_dedup"] = (dedup_df.writeStream
                                  .format("noop").outputMode("append")
                                  .option("checkpointLocation",
                                          os.path.join(root, "ck-dedup"))
                                  .trigger(processingTime="1 second").start())

    win_df = tumbling(with_watermark(src("win"), "ts", "2 hours"),
                      "ts", "1 hour", keys=[],
                      aggs={"cnt": F.count(F.lit(1)), "s": F.sum("v")})
    queries["tumbling_watermark"] = (win_df.writeStream
                                     .format("noop").outputMode("append")
                                     .option("checkpointLocation",
                                             os.path.join(root, "ck-win"))
                                     .trigger(processingTime="1 second")
                                     .start())

    jl = with_watermark(src("jl"), "ts", "2 hours")
    jr = with_watermark(
        src("jr").select(F.col("k"), F.col("ts").alias("rts"),
                         F.col("v").alias("rv")), "rts", "2 hours")
    j = interval_join(jl, jr, "k", "ts", "rts",
                      lower="interval 0 seconds", upper="interval 1 hour")
    queries["interval_join"] = (j.writeStream
                                .format("noop").outputMode("append")
                                .option("checkpointLocation",
                                        os.path.join(root, "ck-join"))
                                .trigger(processingTime="1 second").start())

    try:
        for b in range(1, N):
            feed("dedup", b)
            feed("win", b)
            feed("jl", b)
            feed("jr", b)   # same key space as jl -> rows actually join
            time.sleep(1.6)
        # drain: let the last files process
        time.sleep(8)
        out = {"n_batches": N, "rows_per_batch_per_source": 2000,
               "watermark": "2 hours", "event_time_step": "1 hour",
               "protocol": "continuous processingTime trigger, 1 file/"
                           "trigger, unique keys per batch (no-expiry "
                           "would grow linearly)", "operators": {}}
        ok = True
        for name, q in queries.items():
            series = state_series(q.recentProgress)
            flat = plateau_ok(series)
            ok = ok and flat
            out["operators"][name] = {
                "state_rows_series": series[-18:],
                "max_state_rows": max((v for _, v in series), default=0),
                "flat_tail": flat,
            }
    finally:
        for q in queries.values():
            try:
                q.stop()
            except Exception:
                pass
        shutil.rmtree(root, ignore_errors=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SOAK_streaming_r06.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    assert ok, "state store did not plateau for at least one operator"


if __name__ == "__main__":
    main()
