"""Event-time windows: batch/streaming parity — same transformation, one
run on the bounded DataFrame, one through readStream + availableNow into
the memory sink; results must agree (SURVEY.md §2.8)."""

import datetime

import pytest
from pyspark.sql import functions as F

from spork_spark.streaming import (read_stream, run_to_memory, sessionize,
                                   sliding, tumbling, with_watermark)

SCHEMA = "user_id bigint, ts timestamp, value double"


@pytest.fixture(scope="module")
def events(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for u in (1, 2):
        for k in range(10):
            rows.append((u, t0 + datetime.timedelta(minutes=7 * k + u),
                         float(k)))
    return spark.createDataFrame(rows, SCHEMA)


def test_tumbling_batch(events):
    out = tumbling(events, "ts", "30 minutes", keys=["user_id"],
                   aggs={"cnt": F.count(F.lit(1)),
                         "total": F.round(F.sum("value"), 2)})
    rows = {(r.user_id, r.window_start): r.cnt for r in out.collect()}
    t0 = datetime.datetime(2024, 1, 1)
    # 10 events at 7-min spacing span 63 min → windows at :00, :30, 1:00
    assert rows[(1, t0)] == 5
    assert rows[(1, t0 + datetime.timedelta(minutes=30))] == 4
    assert rows[(1, t0 + datetime.timedelta(minutes=60))] == 1


def test_sliding_batch(events):
    out = sliding(events, "ts", "30 minutes", "15 minutes", keys=["user_id"])
    # every event lands in 2 overlapping windows
    total = sum(r.cnt for r in out.filter(F.col("user_id") == 1).collect())
    assert total == 20


def test_sessionize_batch(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0, 1.0),
            (1, t0 + datetime.timedelta(minutes=10), 1.0),
            (1, t0 + datetime.timedelta(minutes=60), 1.0)]   # gap > 30m
    df = spark.createDataFrame(rows, SCHEMA)
    out = sessionize(df, "ts", "30 minutes", keys=["user_id"])
    assert out.count() == 2                 # two sessions


def test_streaming_matches_batch(spark, events, tmp_path):
    """The definitional test: identical window aggregation, streaming
    (readStream → availableNow → memory sink) vs batch."""
    path = str(tmp_path / "stream_in")
    events.write.mode("overwrite").parquet(path)

    stream = read_stream(spark, path, SCHEMA)
    stream = with_watermark(stream, "ts", "1 hour")
    agg = tumbling(stream, "ts", "30 minutes", keys=["user_id"],
                   aggs={"cnt": F.count(F.lit(1))})
    assert agg.isStreaming
    q = run_to_memory(agg, "tumbling_test", output_mode="complete")
    got = spark.sql("SELECT * FROM tumbling_test")

    expected = tumbling(events, "ts", "30 minutes", keys=["user_id"],
                        aggs={"cnt": F.count(F.lit(1))})
    key = lambda r: (r.user_id, r.window_start)
    assert sorted(map(key, got.collect())) == \
        sorted(map(key, expected.collect()))
    assert {key(r): r.cnt for r in got.collect()} == \
        {key(r): r.cnt for r in expected.collect()}


def test_streaming_session_window(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0 + datetime.timedelta(minutes=m), 1.0)
            for m in (0, 5, 50, 55)]
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "sess_in")
    df.write.mode("overwrite").parquet(path)

    stream = with_watermark(read_stream(spark, path, SCHEMA), "ts", "2 hours")
    agg = sessionize(stream, "ts", "30 minutes", keys=["user_id"])
    q = run_to_memory(agg, "session_test", output_mode="complete")
    got = spark.sql("SELECT * FROM session_test").collect()
    assert len(got) == 2                    # two sessions survive streaming


def test_stateful_running_agg(spark, events, tmp_path):
    """applyInPandasWithState custom operator: after availableNow drains
    all input, the per-key running totals equal the batch groupBy."""
    from spork_spark.streaming import stateful_running_agg

    path = str(tmp_path / "stateful_in")
    events.write.mode("overwrite").parquet(path)
    stream = read_stream(spark, path, SCHEMA)
    agg = stateful_running_agg(stream, ["user_id"], "value")
    assert agg.isStreaming
    q = run_to_memory(agg, "stateful_test", output_mode="update")
    # update mode may emit once per key per batch; the LAST row per key is
    # the final running total.
    got = spark.sql("""
        SELECT user_id, running_cnt, running_sum FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY running_cnt DESC) rn
          FROM stateful_test) WHERE rn = 1""").collect()
    expected = {r.user_id: (r.cnt, r.total) for r in
                events.groupBy("user_id")
                      .agg(F.count(F.lit(1)).alias("cnt"),
                           F.sum("value").alias("total")).collect()}
    assert {r.user_id: (r.running_cnt, r.running_sum) for r in got} == expected


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark contract across runs (the deployment reality: a job that
    restarts from its checkpoint): run 1 commits watermark 11:50; run 2's
    10:02 straggler targets a window already finalized below that
    watermark and is discarded — the emitted count stays 2. (Within a
    single availableNow run Spark's late-row filtering is best-effort —
    the guarantee is per-committed-watermark, which this pins.)"""
    path = str(tmp_path / "wm_in")
    ckpt = str(tmp_path / "wm_ckpt")
    out = str(tmp_path / "wm_out")
    t = lambda m: datetime.datetime(2024, 1, 1, 10, 0) + \
        datetime.timedelta(minutes=m)

    def run_once():
        s = with_watermark(read_stream(spark, path, SCHEMA),
                           "ts", "10 minutes")
        agg = tumbling(s, "ts", "10 minutes", keys=["user_id"],
                       aggs={"cnt": F.count(F.lit(1))})
        q = (agg.writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    b1 = spark.createDataFrame(
        [(1, t(0), 1.0), (1, t(5), 1.0), (1, t(120), 1.0)], SCHEMA)
    b1.coalesce(1).write.mode("overwrite").parquet(path)
    run_once()                       # commits watermark 11:50
    b2 = spark.createDataFrame(
        [(1, t(2), 1.0),             # LATE vs committed watermark: dropped
         (1, t(125), 1.0)], SCHEMA)
    b2.coalesce(1).write.mode("append").parquet(path)
    run_once()

    got = {r.window_start.minute: r.cnt
           for r in spark.read.parquet(out).collect()
           if r.window_start.hour == 10}
    assert got.get(0) == 2           # straggler never counted


def test_interval_join_batch_stream_parity(spark, events, tmp_path):
    """Stream-stream interval join: identical definition run (a) on
    bounded DataFrames and (b) on two watermarked file streams through
    availableNow — same matched pairs. The time bound is what lets
    streaming expire join state."""
    from spork_spark.streaming import interval_join

    left = events.filter(F.col("value") % 2 == 0) \
                 .select("user_id", F.col("ts").alias("l_ts"))
    right = events.filter(F.col("value") % 2 == 1) \
                  .select("user_id", F.col("ts").alias("r_ts"))
    batch = interval_join(left, right, "user_id", "l_ts", "r_ts",
                          lower="interval 0 seconds",
                          upper="interval 10 minutes")
    want = sorted((r[0], r[1], r[3]) for r in batch.collect())
    assert want                                  # non-trivial match set

    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(lp)
    right.write.parquet(rp)
    ls = read_stream(spark, lp, "user_id bigint, l_ts timestamp") \
        .withWatermark("l_ts", "1 minute")
    rs = read_stream(spark, rp, "user_id bigint, r_ts timestamp") \
        .withWatermark("r_ts", "1 minute")
    j = interval_join(ls, rs, "user_id", "l_ts", "r_ts",
                      lower="interval 0 seconds",
                      upper="interval 10 minutes")
    q = run_to_memory(j, "ij_test", output_mode="append")
    got = sorted((r[0], r[1], r[3]) for r in
                 spark.sql("SELECT * FROM ij_test").collect())
    assert got == want


def test_streaming_dedup_batch_stream_parity(spark, tmp_path):
    """streaming_dedup: duplicates arriving within the watermark horizon
    are dropped on both paths; the streaming run uses
    dropDuplicatesWithinWatermark (bounded state), batch uses
    dropDuplicates."""
    from spork_spark.streaming import streaming_dedup

    t0 = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [(1, t0, 1.0),
            (1, t0 + datetime.timedelta(seconds=30), 9.0),   # dup of key 1
            (2, t0 + datetime.timedelta(minutes=1), 2.0),
            (3, t0 + datetime.timedelta(minutes=2), 3.0),
            (2, t0 + datetime.timedelta(minutes=3), 8.0)]    # dup of key 2
    df = spark.createDataFrame(rows, SCHEMA)
    batch = streaming_dedup(df, ["user_id"], "ts")
    assert sorted(r.user_id for r in batch.collect()) == [1, 2, 3]

    path = str(tmp_path / "dedup_in")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    stream = read_stream(spark, path, SCHEMA)
    out = streaming_dedup(stream, ["user_id"], "ts", delay="10 minutes")
    assert out.isStreaming
    run_to_memory(out, "dedup_test", output_mode="append")
    got = spark.sql("SELECT user_id FROM dedup_test").collect()
    assert sorted(r.user_id for r in got) == [1, 2, 3]


def test_stateless_curation_ops_stream(spark, tmp_path):
    """The stateless curation stages (pure Column expressions — classifier
    scoring here) run unchanged on a readStream input: one definition
    serves batch and streaming, so a curation pipeline can score at
    ingest time without a rewrite."""
    from spork_spark.operators import classifier_score

    rows = [(1, "the quick brown fox"), (2, "xq zv9 !!"), (3, "a b a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "cls_in")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    want = sorted(map(tuple, classifier_score(df).collect()))
    stream = read_stream(spark, path, "doc_id long, text string")
    out = classifier_score(stream)
    assert out.isStreaming
    run_to_memory(out, "cls_test", output_mode="append")
    got = sorted(map(tuple, spark.sql("SELECT * FROM cls_test").collect()))
    assert got == want


def test_single_grain_rollup_batch_stream_parity(spark, tmp_path):
    """A single-grain time_rollup is a plain (bucket, dims) aggregation —
    the SAME operator definition runs on a readStream input (complete
    mode), so a continuous hourly rollup needs no rewrite; the coarser
    cascade grains then run as periodic batch over the hourly sink (the
    continuous-aggregate architecture)."""
    import datetime
    from spork_spark.operators import time_rollup

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i % 3, t0 + datetime.timedelta(minutes=17 * i),
             float(i) + 0.25) for i in range(40)]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    path = str(tmp_path / "roll_in")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    want = sorted(map(tuple,
                      time_rollup(df, ts_col="ts", dims=("user_id",),
                                  grains=("hour",)).collect()))
    stream = read_stream(spark, path, SCHEMA)
    out = time_rollup(stream, ts_col="ts", dims=("user_id",),
                      grains=("hour",))
    assert out.isStreaming
    run_to_memory(out, "roll_test", output_mode="complete")
    got = sorted(map(tuple, spark.sql("SELECT * FROM roll_test").collect()))
    assert got == want


def test_write_stream_parquet_roundtrip(spark, tmp_path):
    """Streaming STORE: readStream → windowed agg → parquet sink with
    checkpoint; the written files re-read to exactly the batch result,
    and a second availableNow run adds nothing (exactly-once via the
    checkpoint)."""
    import datetime
    from spork_spark.streaming import write_stream_parquet

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i % 3, t0 + datetime.timedelta(minutes=11 * i), float(i))
            for i in range(30)]
    df = spark.createDataFrame(rows, SCHEMA)
    src = str(tmp_path / "in")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    def agg(d):
        return tumbling(with_watermark(d, "ts", "1 hour"), "ts",
                        "30 minutes", keys=["user_id"],
                        aggs={"cnt": F.count(F.lit(1))})

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = read_stream(spark, src, SCHEMA)
    write_stream_parquet(agg(stream), out, ckpt)
    got = spark.read.parquet(out)
    # append mode emits a window only once the watermark passes its end:
    # the comparable set is the batch result restricted to CLOSED windows
    # (end <= max event time - watermark delay); the open tail stays in
    # state, by design.
    cutoff = t0 + datetime.timedelta(minutes=11 * 29 - 60)
    want = agg(df).filter(F.col("window_end") <= cutoff)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert want.count() > 0
    # replay with the same checkpoint: no new input -> no new rows
    write_stream_parquet(agg(read_stream(spark, src, SCHEMA)), out, ckpt)
    assert spark.read.parquet(out).count() == want.count()


def test_stream_upsert_parquet_cdc_apply(spark, tmp_path):
    """Micro-batched CDC stream merged into a parquet snapshot equals
    one batch merge_upsert of the same changes (order within a key
    resolved by version)."""
    import pyspark.sql.functions as F
    from spork_spark.operators import merge_upsert
    from spork_spark.streaming import stream_upsert_parquet

    src = str(tmp_path / "cdc_in")
    snap = str(tmp_path / "snapshot")
    ck = str(tmp_path / "ck")
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)],
        "id bigint, val string, ver bigint")
    base.write.parquet(snap)
    changes = spark.createDataFrame(
        [(2, "b2", 1), (4, "d", 1), (2, "b3", 2)],
        "id bigint, val string, ver bigint")
    changes.write.parquet(src)

    stream = spark.readStream.schema(changes.schema).parquet(src)
    stream_upsert_parquet(stream, snap, ["id"], ck, version_col="ver")

    got = sorted(map(tuple, spark.read.parquet(snap).collect()))
    want = sorted(map(tuple, merge_upsert(
        base, changes, ["id"], version_col="ver").collect()))
    assert got == want
    assert (2, "b3", 2) in got and (4, "d", 1) in got and (1, "a", 0) in got


def test_stream_upsert_recovers_crashed_swap(spark, tmp_path):
    """Crash-matrix recovery for the three-step snapshot swap: a batch
    starting after a crash must restore whichever side survived.

    Case (b) of the matrix — died after live -> .old but before
    tmp -> live: no live snapshot, an .old dir with all prior history,
    plus a stale .tmp. The next batch must rename .old back (NOT
    rebuild from the batch alone — the r5-advice silent-loss bug) and
    clear the stale tmp before merging."""
    from spork_spark.operators import merge_upsert
    from spork_spark.streaming import stream_upsert_parquet

    src = str(tmp_path / "cdc_in")
    snap = str(tmp_path / "snapshot")
    ck = str(tmp_path / "ck")
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0)], "id bigint, val string, ver bigint")
    # simulate the crash: history sits ONLY in the .old-aside dir, a
    # half-written tmp lingers, there is no live snapshot
    base.write.parquet(snap + ".old-7")
    spark.createDataFrame([(9, "junk", 9)], "id bigint, val string, "
                          "ver bigint").write.parquet(snap + ".tmp-7")
    changes = spark.createDataFrame(
        [(2, "b2", 1), (3, "c", 1)], "id bigint, val string, ver bigint")
    changes.write.parquet(src)

    stream = spark.readStream.schema(changes.schema).parquet(src)
    stream_upsert_parquet(stream, snap, ["id"], ck, version_col="ver")

    got = sorted(map(tuple, spark.read.parquet(snap).collect()))
    want = sorted(map(tuple, merge_upsert(
        base, changes, ["id"], version_col="ver").collect()))
    assert got == want                      # history survived the crash
    assert (1, "a", 0) in got               # the row only .old knew
    assert not any(t for t in got if t[1] == "junk")
    import glob
    import os
    assert not glob.glob(snap + ".old-*")   # aside dirs cleaned up
    assert not glob.glob(snap + ".tmp-*")
    assert os.path.isdir(snap)


def test_stream_upsert_recovers_completed_swap(spark, tmp_path):
    """Case (c): died after tmp -> live but before deleting .old — the
    NEW snapshot is live; recovery must keep it and drop the stale
    .old (restoring .old would resurrect overwritten rows)."""
    from spork_spark.operators import merge_upsert
    from spork_spark.streaming import stream_upsert_parquet

    src = str(tmp_path / "cdc_in")
    snap = str(tmp_path / "snapshot")
    ck = str(tmp_path / "ck")
    live = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 5)], "id bigint, val string, ver bigint")
    live.write.parquet(snap)
    spark.createDataFrame([(1, "stale", 0)], "id bigint, val string, "
                          "ver bigint").write.parquet(snap + ".old-3")
    changes = spark.createDataFrame(
        [(3, "c", 6)], "id bigint, val string, ver bigint")
    changes.write.parquet(src)

    stream = spark.readStream.schema(changes.schema).parquet(src)
    stream_upsert_parquet(stream, snap, ["id"], ck, version_col="ver")

    got = sorted(map(tuple, spark.read.parquet(snap).collect()))
    want = sorted(map(tuple, merge_upsert(
        live, changes, ["id"], version_col="ver").collect()))
    assert got == want
    assert not any(t for t in got if t[1] == "stale")
    import glob
    assert not glob.glob(snap + ".old-*")
