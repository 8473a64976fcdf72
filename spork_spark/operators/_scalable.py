"""Range-partitioned exclusive prefix sum — the scale path for ordered
cumulative aggregates whose input cardinality can approach row
cardinality (rfm_segments' frequency/monetary score maps, abc_classes'
key ranking).

Same two-pass design as the engine's RANK implementation
(compiler/plan.py _scalable_row_number; reference analog
pig:src/org/apache/pig/backend/hadoop/executionengine/physicalLayer/
relationalOperators/POCounter.java + PORank.java): pass 1 range-
partitions the input on the sort order and collects ONE row per
partition (the per-partition sum — bounded driver traffic at any data
size); pass 2 adds the exclusive partition offset to a per-partition
running sum. No single-task global window, no billion-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Above this many rows, ordered-cumulative operators switch from the
#: single-task global window + broadcast map to the range-partitioned
#: two-pass prefix sum. 100k rows is comfortably inside one window
#: task AND one broadcast; overridable per-session for tests and
#: tuning via ``spark.spork.prefixSum.cardinalityFence``.
DEFAULT_CARDINALITY_FENCE = 100_000


def cardinality_fence(spark) -> int:
    try:
        return int(spark.conf.get("spark.spork.prefixSum.cardinalityFence",
                                  str(DEFAULT_CARDINALITY_FENCE)))
    except Exception:
        return DEFAULT_CARDINALITY_FENCE


def exclusive_prefix_sum(df: DataFrame, order: list, value_col: str,
                         out_col: str,
                         num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = sum of ``value_col`` over all rows STRICTLY
    before the current row in ``order`` (exclusive prefix; first row
    gets 0). ``order`` must be a total order (include a tiebreak
    column) or the prefix is nondeterministic at partition boundaries.

    Shape: one range shuffle on the sort key, one bounded driver
    collect (a row per partition), per-partition windows at full
    parallelism. The eager localCheckpoint pins partition ids between
    the count pass and the window pass (recompute does not guarantee
    identical ids — the same discipline as _scalable_row_number).
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    staged = (df.repartitionByRange(n, *order)
                .withColumn("__pid", F.spark_partition_id())
                .localCheckpoint(eager=True))
    per = staged.groupBy("__pid").agg(
        F.sum(F.col(value_col)).alias("__s")).collect()
    sums = {r["__pid"]: (r["__s"] or 0) for r in per}
    offs, acc = [], 0
    for p in sorted(sums):
        offs.append((p, acc))
        acc += sums[p]
    offdf = spark.createDataFrame(offs or [(0, 0)], "__pid int, __off long")
    w = (Window.partitionBy("__pid").orderBy(*order)
               .rowsBetween(Window.unboundedPreceding, -1))
    return (staged.join(F.broadcast(offdf), on="__pid", how="left")
                  .withColumn(out_col,
                              (F.coalesce(F.sum(value_col).over(w),
                                          F.lit(0))
                               + F.coalesce(F.col("__off"), F.lit(0)))
                              .cast("long"))
                  .drop("__pid", "__off"))
