"""Time-series primitives for metric tables: gap filling over a dense
per-key time spine (TimescaleDB locf / hypertable-style continuous-view
repair), and per-group closed-form OLS trend fitting — the "is this
source's volume trending down / fill the missing days before charting"
operations a 100 TB telemetry pipeline runs per batch (extension beyond
the reference surface; SURVEY.md §2.11 family, next to time_rollup and
histogram).

Both follow the repo's exact-arithmetic discipline so the DuckDB oracle
reproduces them bit-for-bit: values are cent-quantized to longs before
summing (double summation order would differ between engines), and the
regression is the textbook normal-equation ratio of exact integer sums
with a sign-split scaled integer division (division of non-negative
integers truncates identically on both engines; `div`/`//` disagree on
negative operands, so the sign travels separately).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill(df: DataFrame, key_col: str, ts_col: str, value_col: str,
             scale: int = 100) -> DataFrame:
    """Dense daily series per key with last-observation-carried-forward.

    Aggregates ``value_col`` to an exact per-(key, day) cent sum
    (``floor(v*scale+0.5)`` per row, summed as long), generates each
    key's full min-day..max-day spine with ``sequence()`` + explode —
    spine rows are born distributed, one array per key, never a driver
    loop — left-joins the observed days, and forward-fills gaps with
    ``last(..., ignorenulls=True)`` over an unbounded-preceding window.
    Day 1 of every key is observed by construction (the spine starts at
    the key's first observation), so LOCF never leaves a null.

    Output: (key, day, value_cents, filled) — ``filled`` marks
    carried-forward rows. One groupBy shuffle on (key, day) plus one
    keyed window shuffle on key; the spine join is key+day equi-join.
    At 100 TB the spine is bounded by keys × span-days (metadata-sized
    next to the event data); a key with a multi-year hole inflates only
    its own array. Skewed keys ride the groupBy's map-side combine.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    cents = F.floor(F.col(value_col).cast("double") * scale + 0.5) \
             .cast("long")
    daily = (df.where(F.col(ts_col).isNotNull()
                      & F.col(value_col).isNotNull())
               .groupBy(F.col(key_col).alias("__k"), day.alias("day"))
               .agg(F.sum(cents).alias("__obs")))
    spine = (daily.groupBy("__k")
                  .agg(F.min("day").alias("__lo"), F.max("day").alias("__hi"))
                  .select("__k", F.explode(F.sequence(
                      F.col("__lo"), F.col("__hi"),
                      F.expr("interval 1 day"))).alias("day")))
    w = (Window.partitionBy("__k").orderBy("day")
               .rowsBetween(Window.unboundedPreceding, 0))
    return (spine.join(daily, on=["__k", "day"], how="left")
                 .withColumn("value_cents",
                             F.last("__obs", ignorenulls=True).over(w))
                 .withColumn("filled", F.col("__obs").isNull())
                 .select(F.col("__k").alias(key_col), "day",
                         "value_cents", "filled"))


def group_ols(df: DataFrame, group_col: str, ts_col: str, value_col: str,
              scale: int = 100, out_scale: int = 10 ** 6) -> DataFrame:
    """Per-group ordinary-least-squares trend of value against time, in
    exact integer arithmetic.

    x = days since the group's FIRST observation (centering keeps the
    integer sums small: x ≤ span-days, not epoch-days), y = cent-
    quantized value. The normal-equation solutions

        slope     = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)
        intercept = (Sy·Sxx − Sx·Sxy) / (n·Sxx − Sx²)   (y at first day)
        r²        = (n·Sxy − Sx·Sy)² / ((n·Sxx − Sx²)(n·Syy − Sy²))

    are ratios of EXACT integer sums (decimal(38,0) accumulators);
    ``*_e6`` columns are those ratios scaled by ``out_scale`` under
    sign-split integer division — abs values divide (identical
    truncation on both engines), the sign multiplies back — so the
    oracle reproduces every digit. Exact while intermediates fit 38
    digits: with day-centered x (≤ ~10⁴) and cent y (≤ ~10⁷) that holds
    to ~10⁹ rows per group for the r² numerator square; pre-aggregate to
    daily grain first (time_rollup) to bound n by span-days when a
    group exceeds that. Degenerate groups (single day: zero x-variance)
    return null slope/intercept/r².

    Shape: one map-side-combined groupBy for the first-day min, a
    broadcast-joinable (group, first_day) table re-joined to the data,
    then ONE aggregation producing the six sums — group-count-sized
    output, no window, no collect.
    """
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    base = (df.where(F.col(ts_col).isNotNull()
                     & F.col(value_col).isNotNull())
              .select(F.col(group_col).alias("__g"), day.alias("__d"),
                      F.floor(F.col(value_col).cast("double") * scale
                              + 0.5).cast("long").alias("__y")))
    first = base.groupBy("__g").agg(F.min("__d").alias("__d0"))
    xy = (base.join(F.broadcast(first), on="__g")
              .withColumn("__x", F.datediff("__d", "__d0").cast("long")))
    sums = xy.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38(F.col("__x"))).alias("sx"),
        F.sum(d38(F.col("__y"))).alias("sy"),
        F.sum(d38(F.col("__x")) * d38(F.col("__y"))).alias("sxy"),
        F.sum(d38(F.col("__x")) * d38(F.col("__x"))).alias("sxx"),
        F.sum(d38(F.col("__y")) * d38(F.col("__y"))).alias("syy"))

    n = d38(F.col("n"))
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    icpt_num = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")

    out = (sums
           .withColumn("__cov", cov).withColumn("__varx", varx)
           .withColumn("__vary", vary).withColumn("__inum", icpt_num))

    def e6(numc, denc):
        # sign-split scaled integer division: exact and engine-portable
        # (non-negative div truncates identically everywhere; `div` vs
        # `//` semantics diverge only on negative operands).
        sign = (F.when(F.col(numc) < 0, F.lit(-1)).otherwise(F.lit(1))
                * F.when(F.col(denc) < 0, F.lit(-1)).otherwise(F.lit(1))
                ).cast("long")
        mag = F.expr(f"(abs({numc}) * cast({out_scale} as decimal(38,0)))"
                     f" div abs({denc})").cast("long")
        return F.when(F.col(denc) == 0, F.lit(None).cast("long")) \
                .otherwise(sign * mag)

    return (out
            .withColumn("slope_e6", e6("__cov", "__varx"))
            .withColumn("intercept_e6", e6("__inum", "__varx"))
            .withColumn("__r2den",
                        (F.col("__varx") * F.col("__vary"))
                        .cast("decimal(38,0)"))
            .withColumn("__r2num",
                        (F.col("__cov") * F.col("__cov"))
                        .cast("decimal(38,0)"))
            .withColumn("r2_e6", e6("__r2num", "__r2den"))
            .select(F.col("__g").alias(group_col), "n",
                    "slope_e6", "intercept_e6", "r2_e6"))


def rolling_sum(df: DataFrame, key_col: str, ts_col: str, value_col: str,
                days: int = 7, scale: int = 100) -> DataFrame:
    """Trailing ``days``-day rolling cent-sum per key, on observed days.

    Values aggregate to exact per-(key, day) cent sums first (one
    map-side-combined groupBy), then ONE keyed window with an integer
    RANGE frame over the epoch-day number — rangeBetween(-(days-1), 0)
    — sums the trailing window. RANGE (not ROWS) so calendar holes
    shorten the window arithmetic correctly without densifying: a key
    observed on days {1, 9} has day 9's trailing week exclude day 1.
    Exact longs end-to-end. One groupBy shuffle + one keyed window
    shuffle; state is the window frame over each key's observed days.
    Compose with gap_fill first when the dense-calendar semantics
    (holes as carried/zero rows) are wanted instead.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    cents = F.floor(F.col(value_col).cast("double") * scale + 0.5) \
             .cast("long")
    daily = (df.where(F.col(ts_col).isNotNull()
                      & F.col(value_col).isNotNull())
               .groupBy(F.col(key_col).alias("__k"), day.alias("day"))
               .agg(F.sum(cents).alias("value_cents")))
    dayn = F.datediff("day", F.lit("1970-01-01")).cast("long")
    return (daily.withColumn("rolling_cents",
                             F.sum("value_cents").over(
                                 Window.partitionBy("__k")
                                       .orderBy(dayn)
                                       .rangeBetween(-(days - 1), 0)))
                 .select(F.col("__k").alias(key_col), "day",
                         "value_cents", "rolling_cents"))


def ewma(df: DataFrame, key_col: str, ts_col: str, value_col: str,
         alpha_num: int = 3, alpha_den: int = 10,
         scale: int = 100) -> DataFrame:
    """Per-key exponentially-weighted moving average of the daily cent
    series, as an EXACT integer recurrence.

    alpha is the RATIONAL alpha_num/alpha_den, and the state lives in
    micro-cent units (cents · 10⁶):

        s_1 = x_1 · 10⁶
        s_t = (alpha_num · x_t · 10⁶ + (alpha_den − alpha_num) · s_{t−1})
              div alpha_den

    — integer arithmetic with one truncating division per step, so
    every engine replays the identical value (a float recurrence would
    hinge on literal parsing and libm; this hinges on nothing). The
    deterministic truncation costs < 1 micro-cent per step. Output:
    (key, day, value_cents, ewma_ucents).

    Shape: one map-side-combined groupBy to daily grain, then ONE
    applyInPandas over each key's ordered days — per-key sequential
    state is intrinsic to EWMA (same class as sessionize); cross-key
    parallelism is the scale axis, and a key's state is two integers.
    The oracle replays the recurrence as a recursive CTE over
    row-numbered days.
    """
    import pandas as pd

    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    cents = F.floor(F.col(value_col).cast("double") * scale + 0.5) \
             .cast("long")
    daily = (df.where(F.col(ts_col).isNotNull()
                      & F.col(value_col).isNotNull())
               .groupBy(F.col(key_col).alias("__k"), day.alias("day"))
               .agg(F.sum(cents).alias("value_cents")))
    a, d = alpha_num, alpha_den
    if not 0 < a < d:
        raise ValueError("need 0 < alpha_num < alpha_den")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        out = []
        s = None
        for x in pdf["value_cents"]:
            xi = int(x) * 10 ** 6
            s = xi if s is None else (a * xi + (d - a) * s) // d
            out.append(s)
        pdf["ewma_ucents"] = out
        return pdf

    res = daily.groupBy("__k").applyInPandas(
        fn, schema="__k " + dict(daily.dtypes)["__k"]
                   + ", day date, value_cents long, ewma_ucents long")
    return res.withColumnRenamed("__k", key_col)


def ohlc(df: DataFrame, key_col: str, ts_col: str, value_col: str,
         id_col: str, scale: int = 100) -> DataFrame:
    """Daily OHLC (open/high/low/close) bars per key — the candlestick
    rollup, on exact cent values.

    Open/close are the first/last observation of the (key, day) group
    under the TOTAL order (ts, id) — the id tiebreak makes simultaneous
    observations deterministic, where a bare min_by/max_by(ts) would
    pick an arbitrary survivor (the merge_upsert lesson). Implemented
    as struct-ordered MIN/MAX aggregates — min(struct(ts, id, v)).v is
    the open — so the whole bar is ONE map-side-combined groupBy; no
    window, no second pass. high/low are plain MIN/MAX.

    Output: (key, day, open_cents, high_cents, low_cents, close_cents,
    n_obs). The oracle replays the same total order with arg_min/
    arg_max over (ts, id) pairs.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    cents = F.floor(F.col(value_col).cast("double") * scale + 0.5) \
             .cast("long")
    base = (df.where(F.col(ts_col).isNotNull()
                     & F.col(value_col).isNotNull())
              .select(F.col(key_col).alias("__k"), day.alias("day"),
                      F.col(ts_col).alias("__ts"),
                      F.col(id_col).alias("__id"),
                      cents.alias("__v")))
    first = F.min(F.struct("__ts", "__id", "__v"))
    last = F.max(F.struct("__ts", "__id", "__v"))
    return (base.groupBy("__k", "day")
                .agg(first.getField("__v").alias("open_cents"),
                     F.max("__v").alias("high_cents"),
                     F.min("__v").alias("low_cents"),
                     last.getField("__v").alias("close_cents"),
                     F.count(F.lit(1)).alias("n_obs"))
                .select(F.col("__k").alias(key_col), "day", "open_cents",
                        "high_cents", "low_cents", "close_cents",
                        "n_obs"))


def twap(df: DataFrame, key_col: str, ts_col: str, value_col: str,
         scale: int = 100, out_scale: int = 10 ** 6) -> DataFrame:
    """Time-weighted average value per key over its observation span —
    the irregular-series mean that duration-weights each observation
    (TimescaleDB time_weight, LOCF convention): an observation holds
    until the next one; the last observation carries no duration.

        twap = Σ v_i · (t_{i+1} − t_i) / (t_n − t_1)

    in exact integers: cents × micro-second durations accumulate in
    decimal(38,0) and the final ratio is a sign-free scaled integer
    division (all terms non-negative) → ``twap_e6`` ≡ cents·10⁶.
    Keys with a single observation (zero span) return null.

    Shape: ONE keyed window (lead) + ONE map-side-combined groupBy —
    the sessionize class. Same-timestamp observations get zero duration
    (they never held); the (ts, value) lead order is made total by the
    value tiebreak so reruns agree.
    """
    cents = F.floor(F.col(value_col).cast("double") * scale + 0.5) \
             .cast("long")
    base = (df.where(F.col(ts_col).isNotNull()
                     & F.col(value_col).isNotNull())
              .select(F.col(key_col).alias("__k"),
                      # fixtures are TIMESTAMP_NTZ; unix_micros wants
                      # TIMESTAMP — identity under the UTC session TZ
                      F.unix_micros(F.col(ts_col).cast("timestamp"))
                       .alias("__t"),
                      cents.alias("__v")))
    w = Window.partitionBy("__k").orderBy("__t", "__v")
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stepped = base.withColumn("__nxt", F.lead("__t").over(w))
    sums = (stepped.groupBy("__k")
                   .agg(F.sum(d38(F.col("__v"))
                              * d38(F.col("__nxt") - F.col("__t")))
                        .alias("__wsum"),
                        F.min("__t").alias("__t0"),
                        F.max("__t").alias("__t1"),
                        F.count(F.lit(1)).alias("n_obs")))
    span = (F.col("__t1") - F.col("__t0")).cast("decimal(38,0)")
    return (sums.select(
        F.col("__k").alias(key_col), "n_obs",
        F.when(F.col("__t1") == F.col("__t0"),
               F.lit(None).cast("long"))
         .otherwise(F.expr(f"(__wsum * {out_scale}) div (__t1 - __t0)")
                     .cast("long"))
         .alias("twap_e6")))


def theil_sen(df: DataFrame, group_col: str, ts_col: str, value_col: str,
              scale: int = 100, out_scale: int = 10 ** 6) -> DataFrame:
    """Per-group Theil–Sen robust trend: the MEDIAN of all pairwise
    slopes of the DAILY-aggregated series — up to ~29% of the days can
    be corrupted before the estimate moves (group_ols, the one-pass
    least-squares path, breaks on a single wild day).

    Exactness: each pair slope lands as the sign-split integer
    ``(y_j − y_i)·10⁶ div (day_j − day_i)`` (denominator positive by
    the day ordering), and the median of those longs interpolates to
    an exact binary double — no rounding hedge.

    Scale fence: the pair stage is a per-group self-equi-join of the
    DAILY series, so pair count is span-days² per group — the daily
    pre-aggregation IS the fence (≈ 66 k pairs per group-year; raw
    rows never pair). Groups parallelize; group_ols remains the
    unfenced path. Output: (group, n_days, slope_e6) with slope_e6 the
    median pair slope (double; null for single-day groups).
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    cents = F.floor(F.col(value_col).cast("double") * scale + 0.5) \
             .cast("long")
    daily = (df.where(F.col(ts_col).isNotNull()
                      & F.col(value_col).isNotNull())
               .groupBy(F.col(group_col).alias("__g"), day.alias("__d"))
               .agg(F.sum(cents).alias("__y"))
               .withColumn("__x", F.datediff(
                   "__d", F.lit("1970-01-01")).cast("long")))
    a = daily.select("__g", F.col("__x").alias("xa"),
                     F.col("__y").alias("ya"))
    b = daily.select(F.col("__g").alias("__g2"),
                     F.col("__x").alias("xb"), F.col("__y").alias("yb"))
    pairs = (a.join(b, (a["__g"] == b["__g2"]) & (a["xa"] < b["xb"]))
              .withColumn("__num", F.col("yb") - F.col("ya"))
              .withColumn("__den", F.col("xb") - F.col("xa"))
              .withColumn("slope_e6",
                          (F.when(F.col("__num") < 0, F.lit(-1))
                            .otherwise(F.lit(1))
                           * F.expr(f"(abs(__num) * {out_scale})"
                                    " div __den")).cast("long")))
    slopes = pairs.groupBy("__g").agg(
        F.percentile(F.col("slope_e6"), F.lit(0.5)).alias("slope_e6"))
    ndays = daily.groupBy("__g").agg(F.count(F.lit(1)).alias("n_days"))
    return (ndays.join(slopes, on="__g", how="left")
                 .select(F.col("__g").alias(group_col), "n_days",
                         "slope_e6"))
