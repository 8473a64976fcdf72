"""Event-time windowing — batch AND Structured Streaming.

The reference is pure batch (SURVEY.md §1.5): Pig has no watermarks or
windows. These are north-star extensions (§2.8): the same window
transformations applied to a bounded DataFrame (batch parity, oracle-
checkable) or to a readStream DataFrame (incremental execution with
watermark-bounded state).

Design rule: every transformation here takes a DataFrame and returns a
DataFrame, agnostic to whether the input is streaming — so one definition
serves both modes, and batch tests pin the streaming semantics. State at
scale is bounded by the watermark horizon (late data beyond the delay is
dropped), which is what makes 100 TB/day streams tractable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_stream(spark: SparkSession, path: str, schema, fmt: str = "parquet",
                **options) -> DataFrame:
    """File-source readStream (the streaming LOAD): new files under `path`
    become micro-batches. Schema is mandatory for streaming file sources."""
    reader = spark.readStream.schema(schema).options(**options)
    return reader.format(fmt).load(path)


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Late-data bound: state for windows older than max(event_time)-delay
    is finalized and dropped. No-op semantics on batch inputs."""
    return df.withWatermark(ts_col, delay)


def tumbling(df: DataFrame, ts_col: str, width: str,
             keys: list[str] | None = None, aggs: dict | None = None
             ) -> DataFrame:
    """Tumbling event-time windows: groupBy(window(ts, width), keys).
    aggs: {out_name: Column} (default count)."""
    aggs = aggs or {"cnt": F.count(F.lit(1))}
    w = F.window(F.col(ts_col), width)
    grouped = df.groupBy(w.alias("w"), *[F.col(k) for k in (keys or [])])
    out = grouped.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(F.col("w.start").alias("window_start"),
                      F.col("w.end").alias("window_end"),
                      *(keys or []), *aggs.keys())


def sliding(df: DataFrame, ts_col: str, width: str, slide: str,
            keys: list[str] | None = None, aggs: dict | None = None
            ) -> DataFrame:
    aggs = aggs or {"cnt": F.count(F.lit(1))}
    w = F.window(F.col(ts_col), width, slide)
    grouped = df.groupBy(w.alias("w"), *[F.col(k) for k in (keys or [])])
    out = grouped.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(F.col("w.start").alias("window_start"),
                      F.col("w.end").alias("window_end"),
                      *(keys or []), *aggs.keys())


def sessionize(df: DataFrame, ts_col: str, gap: str,
               keys: list[str] | None = None, aggs: dict | None = None
               ) -> DataFrame:
    """Session windows (inactivity gap). In streaming mode requires a
    watermark on ts_col; in batch mode runs as-is."""
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    w = F.session_window(F.col(ts_col), gap)
    grouped = df.groupBy(w.alias("w"), *[F.col(k) for k in (keys or [])])
    out = grouped.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(F.col("w.start").alias("session_start"),
                      F.col("w.end").alias("session_end"),
                      *(keys or []), *aggs.keys())


def stateful_running_agg(df: DataFrame, key_cols: list[str], value_col: str,
                         state_timeout: str | None = None) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-key running
    count + sum maintained in explicit GroupState across micro-batches,
    emitting the updated totals each batch.

    This is the arbitrary-stateful-logic escape hatch the built-in windowed
    aggregations can't express (e.g. CEP-ish accumulators, decaying
    counters). State is per-key and Arrow-batched; at scale the state store
    is partitioned by the grouping key, so memory is bounded by
    (#distinct keys in state) / #partitions per executor — pair with a
    timeout to bound unbounded key domains.

    Streaming-only API; batch parity oracle is groupBy(key).agg(count,sum)
    after all input is processed (see tests).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (", ".join(f"{c} {df.schema[c].dataType.simpleString()}"
                            for c in key_cols)
                  + ", running_cnt bigint, running_sum double")

    def fn(key, pdf_iter, state):
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((cnt, total))
        import pandas as pd
        yield pd.DataFrame([[*key, cnt, total]],
                           columns=[*key_cols, "running_cnt", "running_sum"])

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if state_timeout
               else GroupStateTimeout.NoTimeout)
    return (df.groupBy(*key_cols)
              .applyInPandasWithState(fn, out_schema,
                                      "running_cnt bigint, running_sum double",
                                      "update", timeout))


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  left_ts: str, right_ts: str,
                  lower: str = "interval 0 seconds",
                  upper: str = "interval 5 minutes",
                  how: str = "inner") -> DataFrame:
    """Stream-stream (or batch) event-time interval join: match rows with
    equal `key` where right_ts ∈ [left_ts - lower…, left_ts + upper]
    — the enrichment join (clicks↔impressions) pattern.

    Same definition serves batch (oracle-checkable vs a SQL range join)
    and streaming: in streaming mode BOTH inputs need watermarks, and the
    time-range condition is what lets Spark expire join state — without
    it, stream-stream join state grows forever. State per side is bounded
    by (watermark delay + interval width) of buffered rows per key
    partition. Outer variants emit null-extended rows only after the
    watermark passes (correctness over latency)."""
    l, r = left.alias("l"), right.alias("r")
    cond = ((F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col(f"r.{right_ts}")
               >= F.expr(f"l.{left_ts} - {lower}"))
            & (F.col(f"r.{right_ts}")
               <= F.expr(f"l.{left_ts} + {upper}")))
    return l.join(r, on=cond, how=how)


def streaming_dedup(df: DataFrame, id_cols: list[str], ts_col: str,
                    delay: str = "10 minutes") -> DataFrame:
    """Streaming exact deduplication — the ingest-side guard against
    at-least-once sources replaying events. On a stream this uses
    dropDuplicatesWithinWatermark: duplicate keys arriving within the
    watermark horizon are dropped, and the key state is EXPIRED once the
    watermark passes — bounded state, unlike plain dropDuplicates on a
    stream, whose key set grows forever (the state-leak that kills
    long-running 100 TB/day ingest jobs). On a bounded DataFrame the
    same call degrades to dropDuplicates (batch parity oracle).

    Contract: keys recurring farther apart than `delay` are NOT deduped
    in streaming mode (they are in batch) — that is the deliberate
    state/completeness trade every streaming dedup makes; size `delay`
    to the source's replay window."""
    if df.isStreaming:
        return (df.withWatermark(ts_col, delay)
                  .dropDuplicatesWithinWatermark(id_cols))
    return df.dropDuplicates(id_cols)


def run_to_memory(stream_df: DataFrame, query_name: str,
                  output_mode: str = "complete") -> "StreamingQuery":
    """Execute a streaming aggregation into the in-memory sink with the
    availableNow trigger (process everything currently available, then
    stop) — the harness used by tests and the honest local equivalent of
    a production trigger."""
    q = (stream_df.writeStream
         .format("memory").queryName(query_name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def write_stream_parquet(stream_df: DataFrame, path: str,
                         checkpoint: str, output_mode: str = "append",
                         partition_by: tuple = (),
                         available_now: bool = True) -> "StreamingQuery":
    """Streaming STORE: parquet sink with a checkpoint location — the
    production counterpart of run_to_memory. availableNow=True (default)
    processes everything currently available then stops (backfill /
    test semantics); False leaves a continuously-running query for the
    caller to manage. Exactly-once via the checkpoint + parquet sink's
    transactional file manifest; append mode requires a watermark
    upstream for aggregations (Spark enforces it)."""
    w = (stream_df.writeStream
         .format("parquet")
         .option("path", path)
         .option("checkpointLocation", checkpoint)
         .outputMode(output_mode))
    if partition_by:
        w = w.partitionBy(*partition_by)
    if available_now:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return w.start()


def stream_upsert_parquet(stream_df: DataFrame, snapshot_path: str,
                          keys: list, checkpoint: str,
                          version_col: str = None,
                          delete_col: str = None) -> "StreamingQuery":
    """Streaming CDC apply: MERGE each micro-batch into a parquet
    snapshot via foreachBatch + operators.upsert.merge_upsert — the
    change-data-capture sink that keeps a dimension/state table current
    from an event stream (the Delta/Iceberg MERGE INTO shape, on plain
    parquet).

    Each micro-batch (a) collapses to one row per key (merge_upsert's
    deterministic max-version tiebreak), (b) anti-joins the current
    snapshot on the batch's keys — the snapshot never shuffles; the
    batch's key set broadcasts — and (c) publishes the snapshot with a
    crash-safe three-step swap: write to `<path>.tmp-<batch_id>`,
    rename the live snapshot aside to `<path>.old-<batch_id>`, rename
    the tmp into place, then delete the `.old` dir. `os.rename` cannot
    atomically replace a non-empty directory, so a bare
    rmtree-then-rename would lose ALL history if the process died
    between the two calls; with the aside-rename, every crash point
    leaves either the old snapshot or the new one recoverable, and
    batch start restores a leftover `.old` dir before merging. On
    object stores a manifest-pointer swap replaces the rename pair (the
    piece Delta's transaction log provides — documented, not faked,
    here). Exactly-once per batch via the checkpoint: a replayed batch
    re-merges idempotently because merge_upsert is idempotent for a
    fixed batch.

    Crash-safety covers the WRITER only: between the two renames the
    snapshot path transiently does not exist, so an external reader
    concurrent with a swap must tolerate (retry on) a missing
    directory. Reader-atomic publication needs a pointer swap — a
    symlink or manifest file naming the current snapshot dir, updated
    with an atomic rename — layered on top; plain-parquet readers that
    only run between batches (the availableNow backfill pattern here)
    never observe the window.

    Scale: cost per batch ∝ snapshot size for the rewrite — the plain-
    parquet trade (Delta rewrites only touched files); partition the
    snapshot and prune by the batch's partition keys when that bites.
    availableNow trigger (process-all-then-stop) keeps the test/backfill
    semantics of the other sinks.
    """
    import os
    import shutil

    from spork_spark.operators import merge_upsert

    spark = stream_df.sparkSession

    def recover_snapshot():
        """Restore a snapshot left aside by a crash mid-swap.

        Crash matrix: (a) died after writing tmp but before any rename
        → live snapshot intact, stale tmp removed here; (b) died after
        renaming live → .old but before tmp → live: live missing, .old
        present → .old renamed back; (c) died after tmp → live but
        before deleting .old: both present → .old deleted (new
        snapshot already published)."""
        import glob
        # glob.escape: a metacharacter in the path ('[', '?', '*')
        # would otherwise match nothing and silently skip recovery —
        # exactly the loss this function exists to prevent
        base = glob.escape(snapshot_path)
        for old in sorted(glob.glob(f"{base}.old-*")):
            if os.path.isdir(snapshot_path):
                shutil.rmtree(old)
            else:
                os.rename(old, snapshot_path)
        for tmp in glob.glob(f"{base}.tmp-*"):
            shutil.rmtree(tmp)

    def apply_batch(batch_df: DataFrame, batch_id: int):
        if not batch_df.head(1):
            return
        recover_snapshot()
        if os.path.isdir(snapshot_path):
            base = spark.read.parquet(snapshot_path)
            merged = merge_upsert(base, batch_df.select(*base.columns)
                                  if delete_col is None else batch_df,
                                  keys, version_col=version_col,
                                  delete_col=delete_col)
        else:
            merged = batch_df
            if version_col is not None:
                merged = merge_upsert(
                    batch_df.limit(0), batch_df, keys,
                    version_col=version_col, delete_col=delete_col)
            elif delete_col is not None:
                merged = merge_upsert(
                    batch_df.drop(delete_col).limit(0), batch_df, keys,
                    delete_col=delete_col)
        tmp = f"{snapshot_path}.tmp-{batch_id}"
        old = f"{snapshot_path}.old-{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(snapshot_path):
            os.rename(snapshot_path, old)
        os.rename(tmp, snapshot_path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    # Repair a crashed swap BEFORE the query starts, not only inside
    # apply_batch: a restart whose trigger delivers no batches (or only
    # empty ones) would otherwise leave the live snapshot missing with
    # the history stranded in `.old-*`.
    recover_snapshot()
    q = (stream_df.writeStream
         .foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
