"""Hypertable-style multi-resolution time-bucket rollup (the TimescaleDB
continuous-aggregate shape; extension beyond the reference surface —
SURVEY.md §2.8 event-time family).

Design for 100 TB: a CASCADE, not grouping sets. The raw corpus is
shuffled ONCE, at the finest grain; every coarser grain re-aggregates the
previous (already tiny) rollup — SUM/COUNT/MIN/MAX compose exactly, AVG
derives from sum/count at read time. A grouping-sets formulation would
expand every raw row |grains|× BEFORE its shuffle; the cascade's coarser
stages shuffle rows proportional to the number of *buckets*, which is
orders of magnitude smaller than the corpus at any realistic grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fine → coarse; each grain must re-bucket exactly onto the next
_GRAIN_ORDER = ["minute", "hour", "day", "week", "month", "year"]


def time_rollup(df: DataFrame, ts_col: str = "ts",
                dims: tuple = ("event_type",), value_col: str = "value",
                grains: tuple = ("hour", "day")) -> DataFrame:
    """Aggregate ``value_col`` per (time bucket, *dims) at every grain in
    ``grains`` in one pass over the input: count / sum / min / max, with
    the sum carried in decimal(38,2) so re-aggregation is EXACT and
    order-independent (a double sum would drift between the raw and
    cascaded paths). Output: (grain, bucket, *dims, cnt, sum_value,
    min_value, max_value), finest grain first."""
    order = {g: i for i, g in enumerate(_GRAIN_ORDER)}
    unknown = [g for g in grains if g not in order]
    if unknown:
        raise ValueError(f"unknown grain(s) {unknown}; "
                         f"choose from {_GRAIN_ORDER}")
    sorted_grains = sorted(set(grains), key=order.__getitem__)
    dims = list(dims)

    finest = sorted_grains[0]
    base = (df.groupBy(F.date_trunc(finest, F.col(ts_col)).alias("bucket"),
                       *[F.col(d) for d in dims])
              .agg(F.count(F.lit(1)).alias("cnt"),
                   F.sum(F.col(value_col).cast("decimal(18,2)"))
                    .cast("decimal(38,2)").alias("sum_value"),
                   F.min(F.col(value_col)).alias("min_value"),
                   F.max(F.col(value_col)).alias("max_value")))
    if len(sorted_grains) > 1:
        # Every non-final level is consumed TWICE (as an output grain and
        # as the next grain's input); without materialization each union
        # branch re-derives it from RAW — the plan scans the corpus once
        # per grain, exactly what the cascade exists to avoid. The level
        # is bucket-count sized, so an eager localCheckpoint is cheap.
        base = base.localCheckpoint(eager=True)
    levels = [base.select(F.lit(finest).alias("grain"), "*")]
    prev = base
    for i, grain in enumerate(sorted_grains[1:], start=1):
        # coarser grains aggregate the AGGREGATE — input is bucket-count
        # sized, so this shuffle is negligible next to the base one
        prev = (prev.groupBy(F.date_trunc(grain, F.col("bucket"))
                             .alias("bucket"),
                             *[F.col(d) for d in dims])
                    .agg(F.sum("cnt").alias("cnt"),
                         F.sum("sum_value").cast("decimal(38,2)")
                          .alias("sum_value"),
                         F.min("min_value").alias("min_value"),
                         F.max("max_value").alias("max_value")))
        if i < len(sorted_grains) - 1:
            prev = prev.localCheckpoint(eager=True)
        levels.append(prev.select(F.lit(grain).alias("grain"), "*"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
