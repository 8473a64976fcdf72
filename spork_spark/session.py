"""SparkSession factory with Pig-compatible semantics.

The reference engine (sigmoidanalytics/spork = Apache Pig's Spark backend,
see SURVEY.md §0) has null-on-error cast semantics: a failed cast produces
``null`` plus a warning counter, never an exception
(pig:src/org/apache/pig/backend/hadoop/executionengine/physicalLayer/
expressionOperators/POCast.java). PySpark 4.x defaults to ANSI mode, which
*throws* on bad casts / overflow — so the engine session turns ANSI off and
compiles Pig casts to ``try_cast`` equivalents (SURVEY.md §1.3).

Scale posture (100 TB design, tested on local[32]):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting
  (replaces the reference's SkewedPartitioner machinery, SURVEY.md §4.2).
- Broadcast threshold tuned so small dims (region/nation/supplier at any
  realistic SF) broadcast; Pig's ``USING 'replicated'`` maps to an explicit
  broadcast hint regardless of threshold.
- Arrow enabled for the Pandas-UDF extension operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32] test harness; on a real cluster the
# caller passes its own master/conf and only the semantic confs below matter.
_SEMANTIC_CONF = {
    # Pig semantics: bad cast -> null, int overflow wraps (Java semantics).
    "spark.sql.ansi.enabled": "false",
    # Session timezone: Pig datetimes are instant-based (Joda ms + TZ).
    "spark.sql.session.timeZone": "UTC",
    # Nanosecond-precision parquet timestamps read as long (sources.read
    # downcasts ns→µs TIMESTAMP_NTZ itself); set here once rather than
    # mutated per-read — it is a session-global knob.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

_SCALE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Static auto-broadcast OFF, AQE runtime conversion ON (10 MB).
    # The static threshold decides from pre-filter file-size estimates —
    # at 100 TB that is exactly how a "small" side turns out to be tens of
    # GB post-scan and OOMs the build. AQE's conversion uses the EXACT
    # shuffle bytes observed at runtime, so small dims (region/nation,
    # a filtered supplier) still become broadcast joins, with no estimate
    # risk. Measured at sf0.1 this is also faster: the static planner
    # chose to broadcast the column-pruned 600k-row lineitem (fits 10 MB)
    # and paid ~0.2 s building the hash relation; the runtime plan joins
    # it by shuffle. Pig 'replicated' joins get an explicit broadcast()
    # hint regardless of either threshold.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # local[32] default; a real deployment sizes this to cluster cores and
    # lets AQE coalesce down.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # Long-lived driver hygiene: the status store retains per-execution /
    # per-job/stage metadata forever at the defaults (1000 executions,
    # 1000 jobs); a driver serving tens of thousands of queries (a soak
    # run here; a resident service at 100 TB) accumulates heap until it
    # OOMs. Bound the retention — the UI only needs recent history.
    "spark.sql.ui.retainedExecutions": "100",
    "spark.ui.retainedJobs": "200",
    "spark.ui.retainedStages": "200",
    "spark.ui.retainedTasks": "2000",
    # Same resident-driver hygiene for STORAGE: localCheckpoint blocks
    # (graph/rollup/asof lineage truncation) free through the
    # ContextCleaner, which only learns an RDD is dead from a JVM GC —
    # and a mostly-idle large-heap driver can go very long between full
    # GCs, stranding checkpoint blocks (tools/soak.py measures this
    # directly). Spark's own knob for exactly this: periodic GC every
    # 10 min instead of the 30 min default.
    "spark.cleaner.periodicGC.interval": "10min",
}


def _input_bytes(data_dir: str) -> int:
    """Bytes of the largest table under ``data_dir`` (file or directory
    table) — the number that sizes the biggest scan/shuffle."""
    best = 0
    try:
        for name in os.listdir(data_dir):
            p = os.path.join(data_dir, name)
            if os.path.isdir(p):
                # Recurse: a Hive-partitioned table is table/part=x/file;
                # counting only the top-level entries would measure a few
                # KB of directory inodes and silently undersize the
                # session — the exact failure mode autosizing prevents.
                sz = 0
                for root, dirs, files in os.walk(p):
                    dirs[:] = [d for d in dirs if not d.startswith("_")]
                    sz += sum(os.path.getsize(os.path.join(root, f))
                              for f in files if not f.startswith("_"))
            else:
                sz = os.path.getsize(p)
            best = max(best, sz)
    except OSError:
        return 0
    return best


def autosize_conf(input_bytes: int, cores: int | None = None) -> dict:
    """Derive data-dependent session sizing from the largest input's bytes
    (SCALE_r03.json finding 5: the sf0.1 profile applied 10x data left
    `distinct` at 1.70 s; input-derived sizing brought it to 0.86 s).

    - ``shuffle.partitions``: an UPPER bound of ~3 MB of scan input per
      shuffle partition, floored at the core count and capped at 2048.
      AQE (on by default) coalesces DOWN at runtime using exact shuffle
      bytes, so oversizing is safe both ways; static undersizing is the
      failure mode this prevents.
    - ``files.maxPartitionBytes``: split scans so the map side has >=2
      tasks per core (the sf1 fixture is 16 x 11 MB files; the default
      128 MB splits would cap the scan at 16 of 32 cores).
    At 100 TB the same rule lands near the cap and AQE takes over.
    """
    cores = cores or os.cpu_count() or 8
    if input_bytes <= 0:
        return {}
    parts = max(cores, min(2048, input_bytes // (3 * 1024 * 1024) or 1))
    split = max(4 * 1024 * 1024,
                min(128 * 1024 * 1024, input_bytes // (2 * cores) or 1))
    return {
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.files.maxPartitionBytes": str(split),
    }


def get_spark(app_name: str = "spork-spark", master: str | None = None,
              extra_conf: dict | None = None,
              data_dir: str | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Master resolution: explicit arg > $SPARK_GRAFT_CPUS (local[N]) >
    existing session > local[*].

    Session sizing follows the data by default: if ``data_dir`` (or
    $SPARK_GRAFT_SF_DIR) names the input directory, shuffle-partition
    upper bound and scan split size are derived from the largest table's
    bytes (see ``autosize_conf``); explicit ``extra_conf`` and
    $SPARK_GRAFT_SHUFFLE always win.
    """
    builder = SparkSession.builder.appName(app_name)
    # local-mode JVMs default to a 1g heap regardless of machine size —
    # fine at the correctness-gate scale, but 32 concurrent tasks'
    # shuffle/join buffers overrun it at sf1+. Create-time-only conf, so
    # it is a no-op when attaching to an existing session; explicit
    # extra_conf / $SPARK_GRAFT_DRIVER_MEM stay authoritative.
    if not (extra_conf and "spark.driver.memory" in extra_conf):
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus:
            master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    cores = None
    if master and master.startswith("local[") and master[6:-1].isdigit():
        cores = int(master[6:-1])
    sized = dict(_SCALE_CONF)
    data_dir = data_dir or os.environ.get("SPARK_GRAFT_SF_DIR")
    auto = {}
    if data_dir and "SPARK_GRAFT_SHUFFLE" not in os.environ:
        auto = autosize_conf(_input_bytes(data_dir), cores)
        sized.update(auto)
    for k, v in {**_SEMANTIC_CONF, **sized, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Semantic confs are runtime-settable; enforce them even on a session we
    # didn't create (e.g. the driver's) so cast/null behavior is Pig's.
    for k, v in _SEMANTIC_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    # Sizing confs are runtime-settable too; re-apply on a reused session so
    # a long-lived driver pointed at new data resizes without restart.
    # Explicit extra_conf keys stay authoritative.
    for k, v in auto.items():
        if extra_conf and k in extra_conf:
            continue
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's semantic confs to an externally-created session."""
    for k, v in _SEMANTIC_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
