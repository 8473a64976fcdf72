"""Session-scoped registry for engine-managed Dataset persists.

``Dataset.persist()`` registers the plan in Spark's CacheManager, which
holds a STRONG reference until an explicit ``unpersist()`` — unlike
RDD-level persists (``localCheckpoint``), these are never reclaimed by
GC. A resident driver that compiles thousands of multi-consumer plans
(SPLIT / multi-store reuse, SURVEY.md §4.2) would therefore accumulate
cached tables until executor storage pressure — the leak class
tools/soak.py exists to catch.

Every persist the compiler performs on the caller's behalf goes through
``track()``; ``release_cached(spark)`` is the maintenance call a
long-lived service makes after materializing outstanding results (and
what ``Engine.release_cache()`` forwards to). Releasing while a derived
DataFrame is still unmaterialized is safe for correctness — Spark
recomputes the subplan — it only forfeits the reuse the persist bought.

(The RANK staging tables are NOT tracked here: they capture
``spark_partition_id`` after a range exchange, whose recompute is not
bit-stable — RangePartitioner's sample seed derives from the RDD id —
so they use eager ``localCheckpoint`` instead, which both freezes the
partition assignment and frees via GC with the result's lineage.)
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

# session -> list of live tracked DataFrames; WeakKeyDictionary so a
# stopped/abandoned session doesn't pin its tracked list
_tracked: "weakref.WeakKeyDictionary[SparkSession, list[DataFrame]]" = \
    weakref.WeakKeyDictionary()


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later release."""
    df = df.persist()
    _tracked.setdefault(df.sparkSession, []).append(df)
    return df


def tracked_count(spark: SparkSession) -> int:
    return len(_tracked.get(spark, []))


def release_cached(spark: SparkSession) -> int:
    """Unpersist every tracked DataFrame for this session; returns how
    many were released. Call after outstanding results are materialized
    (an unmaterialized consumer simply recomputes)."""
    dfs = _tracked.pop(spark, [])
    for df in dfs:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to release
    return len(dfs)
