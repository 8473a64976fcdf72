"""Hypertable-style multi-resolution time-bucket rollup (the TimescaleDB
continuous-aggregate shape; extension beyond the reference surface —
SURVEY.md §2.8 event-time family).

Design for 100 TB: a CASCADE, not grouping sets. The raw corpus is
shuffled ONCE, at the finest grain; every coarser grain re-aggregates an
already-computed (tiny) rollup — SUM/COUNT/MIN/MAX compose exactly, AVG
derives from sum/count at read time. A grouping-sets formulation would
expand every raw row |grains|× BEFORE its shuffle; the cascade's coarser
stages shuffle rows proportional to the number of *buckets*, which is
orders of magnitude smaller than the corpus at any realistic grain.

Grain nesting is respected, not assumed: weeks do NOT tile months or
years (date_trunc('month', week_bucket) pushes a week straddling the
boundary into the wrong month), so each coarser grain cascades from the
COARSEST computed level whose buckets tile it exactly — and when 'week'
is requested together with a coarser grain, the engine buckets the base
pass at 'day' (the common refinement) so every grain still derives from
the single raw shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fine → coarse
_GRAIN_ORDER = ["minute", "hour", "day", "week", "month", "year"]
_ORD = {g: i for i, g in enumerate(_GRAIN_ORDER)}


def _tiles(src: str, dst: str) -> bool:
    """True when every ``src`` bucket lies entirely inside one ``dst``
    bucket, i.e. date_trunc(dst, src_bucket) == date_trunc(dst, ts) for
    every ts in the src bucket. minute/hour/day tile everything coarser;
    months tile years; WEEKS tile nothing coarser (a week straddles
    month/year boundaries)."""
    if src == dst:
        return True
    if _ORD[src] > _ORD[dst]:
        return False
    if src == "week":
        return False
    if src == "month":
        return dst == "year"
    return True


def time_rollup(df: DataFrame, ts_col: str = "ts",
                dims: tuple = ("event_type",), value_col: str = "value",
                grains: tuple = ("hour", "day")) -> DataFrame:
    """Aggregate ``value_col`` per (time bucket, *dims) at every grain in
    ``grains`` in one pass over the input: count / sum / min / max, with
    the sum carried in decimal(38,2) so re-aggregation is EXACT and
    order-independent (a double sum would drift between the raw and
    cascaded paths). Output: (grain, bucket, *dims, cnt, sum_value,
    min_value, max_value), finest grain first."""
    unknown = [g for g in grains if g not in _ORD]
    if unknown:
        raise ValueError(f"unknown grain(s) {unknown}; "
                         f"choose from {_GRAIN_ORDER}")
    sorted_grains = sorted(set(grains), key=_ORD.__getitem__)
    dims = list(dims)

    # Base pass (the one raw shuffle). If 'week' is requested alongside a
    # coarser grain, neither tiles the other — bucket the base at 'day',
    # the common refinement, so both still derive from one scan.
    base_grain = sorted_grains[0]
    if "week" in sorted_grains and \
            any(_ORD[g] > _ORD["week"] for g in sorted_grains) and \
            _ORD[base_grain] >= _ORD["week"]:
        base_grain = "day"
    synthetic_base = base_grain not in sorted_grains

    def agg_raw(grain):
        return (df.groupBy(
                    F.date_trunc(grain, F.col(ts_col)).alias("bucket"),
                    *[F.col(d) for d in dims])
                  .agg(F.count(F.lit(1)).alias("cnt"),
                       F.sum(F.col(value_col).cast("decimal(18,2)"))
                        .cast("decimal(38,2)").alias("sum_value"),
                       F.min(F.col(value_col)).alias("min_value"),
                       F.max(F.col(value_col)).alias("max_value")))

    def agg_level(src_df, grain):
        # coarser grains aggregate the AGGREGATE — input is bucket-count
        # sized, so this shuffle is negligible next to the base one
        return (src_df.groupBy(F.date_trunc(grain, F.col("bucket"))
                               .alias("bucket"),
                               *[F.col(d) for d in dims])
                      .agg(F.sum("cnt").alias("cnt"),
                           F.sum("sum_value").cast("decimal(38,2)")
                            .alias("sum_value"),
                           F.min("min_value").alias("min_value"),
                           F.max("max_value").alias("max_value")))

    base = agg_raw(base_grain)
    remaining = [g for g in sorted_grains if g != base_grain]
    if remaining:
        # Levels that feed later levels (or double as outputs) are
        # consumed more than once; without materialization each union
        # branch re-derives them from RAW. They are bucket-count sized,
        # so an eager localCheckpoint is cheap.
        base = base.localCheckpoint(eager=True)
    computed = [(base_grain, base)]
    levels = [] if synthetic_base else \
        [base.select(F.lit(base_grain).alias("grain"), "*")]
    for i, grain in enumerate(remaining):
        src = next(d for g, d in reversed(computed) if _tiles(g, grain))
        cur = agg_level(src, grain)
        if i < len(remaining) - 1:
            cur = cur.localCheckpoint(eager=True)
        computed.append((grain, cur))
        levels.append(cur.select(F.lit(grain).alias("grain"), "*"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def rollup_merge(snapshot: DataFrame, delta: DataFrame,
                 dims: tuple = ("event_type",)) -> DataFrame:
    """Fold a late-arriving delta rollup into an existing rollup
    snapshot WITHOUT rescanning raw history — the continuous-aggregate
    refresh step (TimescaleDB's invalidation-refresh shape; SURVEY.md
    §2.8 event-time family). At 100 TB the raw corpus is append-mostly
    and the rollup snapshot is bucket-count sized: recomputing from raw
    to absorb a 0.1% late tail re-shuffles everything, while this merge
    shuffles only snapshot+delta rollup rows (proportional to BUCKETS,
    not events).

    Correct because every carried aggregate is decomposable: cnt and
    sum_value re-SUM (sum is decimal(38,2) — exact, order-independent),
    min/max re-MIN/MAX. AVG stays derivable as sum/cnt. Inputs are two
    outputs of ``time_rollup`` over disjoint row sets with the same
    grains/dims; output schema matches time_rollup, so merges chain
    (snapshot ⊕ delta1 ⊕ delta2 — associative and commutative).

    Shape: unionByName + ONE groupBy on (grain, bucket, *dims) with
    map-side partial agg; no join, no window, no raw-data scan.
    """
    keys = ["grain", "bucket", *dims]
    return (snapshot.unionByName(delta)
            .groupBy(*[F.col(k) for k in keys])
            .agg(F.sum("cnt").cast("long").alias("cnt"),
                 F.sum("sum_value").cast("decimal(38,2)")
                  .alias("sum_value"),
                 F.min("min_value").alias("min_value"),
                 F.max("max_value").alias("max_value")))
