"""gap_fill (dense spine + LOCF) and group_ols (exact integer OLS)."""
import pytest
from pyspark.sql import functions as F

from spork_spark.operators import gap_fill, group_ols


def test_gap_fill_locf_and_flags(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 1.00),
         ("a", "2024-01-01 11:00:00", 2.50),   # same day: sums to 350
         ("a", "2024-01-04 09:00:00", 7.00),   # 2-day hole before this
         ("b", "2024-01-02 00:00:00", 5.00)],
        "k string, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r.k, str(r.day)): (r.value_cents, r.filled)
           for r in gap_fill(df, "k", "ts", "value").collect()}
    assert out[("a", "2024-01-01")] == (350, False)
    assert out[("a", "2024-01-02")] == (350, True)    # carried forward
    assert out[("a", "2024-01-03")] == (350, True)
    assert out[("a", "2024-01-04")] == (700, False)
    assert out[("b", "2024-01-02")] == (500, False)   # 1-day key: no spine
    assert len(out) == 5                              # dense, no extras
    assert all(v is not None for v, _ in out.values())  # LOCF total


def test_gap_fill_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1.0),
         ("a", None, 9.0), ("a", "2024-01-02 00:00:00", None)],
        "k string, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    rows = gap_fill(df, "k", "ts", "value").collect()
    assert [(r.k, str(r.day), r.value_cents) for r in rows] \
        == [("a", "2024-01-01", 100)]


def test_group_ols_exact_line(spark):
    # y = 3.00 + 2.00 * day  (cents: 300 + 200x) -> exact closed form
    rows = [("g", f"2024-01-{d + 1:02d} 00:00:00", 3.0 + 2.0 * d)
            for d in range(10)]
    df = spark.createDataFrame(rows, "g string, ts string, value double") \
              .withColumn("ts", F.col("ts").cast("timestamp"))
    r = group_ols(df, "g", "ts", "value").collect()[0]
    assert (r.n, r.slope_e6, r.intercept_e6, r.r2_e6) \
        == (10, 200_000_000, 300_000_000, 1_000_000)


def test_group_ols_negative_slope_and_degenerate(spark):
    rows = [("down", f"2024-01-{d + 1:02d} 00:00:00", 10.0 - 0.5 * d)
            for d in range(4)]
    rows += [("flatday", "2024-02-01 00:00:00", 1.0),
             ("flatday", "2024-02-01 12:00:00", 3.0)]   # single day
    df = spark.createDataFrame(rows, "g string, ts string, value double") \
              .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.g: r for r in group_ols(df, "g", "ts", "value").collect()}
    assert out["down"].slope_e6 == -50_000_000          # -50 cents/day
    assert out["down"].r2_e6 == 1_000_000
    assert out["flatday"].slope_e6 is None              # zero x-variance
    assert out["flatday"].intercept_e6 is None
    assert out["flatday"].r2_e6 is None


def test_rolling_sum_range_frame_respects_holes(spark):
    from spork_spark.operators import rolling_sum
    rows = [("a", "2024-01-01 00:00:00", 1.0),
            ("a", "2024-01-03 00:00:00", 2.0),
            ("a", "2024-01-09 00:00:00", 4.0),   # day 1 falls out of window
            ("b", "2024-01-01 00:00:00", 8.0)]
    df = spark.createDataFrame(rows, "k string, ts string, value double") \
              .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r.k, str(r.day)): r.rolling_cents
           for r in rolling_sum(df, "k", "ts", "value", days=7).collect()}
    assert out[("a", "2024-01-01")] == 100
    assert out[("a", "2024-01-03")] == 300          # day1 + day3
    assert out[("a", "2024-01-09")] == 600          # day3 + day9 only
    assert out[("b", "2024-01-01")] == 800


def test_ewma_exact_integer_recurrence(spark):
    from spork_spark.operators import ewma
    rows = [("a", f"2024-01-0{d} 00:00:00", float(v))
            for d, v in [(1, 10.0), (2, 20.0), (3, 10.0)]]
    df = spark.createDataFrame(rows, "k string, ts string, value double") \
              .withColumn("ts", F.col("ts").cast("timestamp"))
    out = [r.ewma_ucents for r in
           ewma(df, "k", "ts", "value").orderBy("day").collect()]
    # cents: 1000, 2000, 1000; micro: s1=1e9
    s1 = 1000 * 10 ** 6
    s2 = (3 * 2000 * 10 ** 6 + 7 * s1) // 10
    s3 = (3 * 1000 * 10 ** 6 + 7 * s2) // 10
    assert out == [s1, s2, s3]


def test_ewma_partition_invariant(spark):
    from spork_spark.operators import ewma
    import random
    rng = random.Random(5)
    rows = [(f"k{i % 7}", f"2024-{1 + (i // 28) % 12:02d}-{1 + i % 28:02d}"
             " 00:00:00", rng.uniform(0, 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "k string, ts string, value double") \
              .withColumn("ts", F.col("ts").cast("timestamp"))
    a = sorted(map(tuple, ewma(df.repartition(1), "k", "ts", "value").collect()))
    b = sorted(map(tuple, ewma(df.repartition(11), "k", "ts", "value").collect()))
    assert a == b


def test_ohlc_deterministic_open_close(spark):
    from spork_spark.operators import ohlc
    rows = [  # two obs share the opening timestamp: id breaks the tie
        ("a", "2024-01-01 09:00:00", 2, 5.0),
        ("a", "2024-01-01 09:00:00", 1, 3.0),     # open (smaller id)
        ("a", "2024-01-01 12:00:00", 3, 9.0),     # high
        ("a", "2024-01-01 17:00:00", 4, 1.0),     # low + close
        ("a", "2024-01-02 10:00:00", 5, 7.0),
        ("b", "2024-01-01 10:00:00", 6, 4.0)]
    df = spark.createDataFrame(
        rows, "k string, ts string, event_id bigint, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r.k, str(r.day)): r for r in
           ohlc(df, "k", "ts", "value", "event_id").collect()}
    bar = out[("a", "2024-01-01")]
    assert (bar.open_cents, bar.high_cents, bar.low_cents,
            bar.close_cents, bar.n_obs) == (300, 900, 100, 100, 4)
    assert out[("a", "2024-01-02")].open_cents == 700
    assert out[("b", "2024-01-01")].n_obs == 1


def test_twap_duration_weighting(spark):
    from spork_spark.operators import twap
    rows = [  # v=10 holds 1h, v=20 holds 3h -> twap = (10+60)/4 = 17.5
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 01:00:00", 20.0),
        ("a", "2024-01-01 04:00:00", 99.0),       # last: no duration
        ("b", "2024-01-01 00:00:00", 5.0)]        # single obs: null
    df = spark.createDataFrame(rows, "k string, ts string, value double") \
              .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.k: r for r in twap(df, "k", "ts", "value").collect()}
    assert out["a"].twap_e6 == 1750 * 10 ** 6     # 17.50 in cents*1e6
    assert out["a"].n_obs == 3
    assert out["b"].twap_e6 is None


def test_theil_sen_robust_to_outlier_day(spark):
    from spork_spark.operators import theil_sen, group_ols
    # perfect slope 1.00/day, except one wild day
    rows = [("a", f"2024-01-{d + 1:02d} 00:00:00",
             float(d + 1) if d != 5 else 1000.0) for d in range(9)]
    df = spark.createDataFrame(rows, "g string, ts string, value double") \
              .withColumn("ts", F.col("ts").cast("timestamp"))
    ts_row = theil_sen(df, "g", "ts", "value").collect()[0]
    assert ts_row.n_days == 9
    assert ts_row.slope_e6 == 100 * 10 ** 6          # 100 cents/day exact
    ols_row = group_ols(df, "g", "ts", "value").collect()[0]
    assert abs(ols_row.slope_e6 - 100 * 10 ** 6) > 10 ** 7  # OLS dragged


def test_theil_sen_single_day_null(spark):
    from spork_spark.operators import theil_sen
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 5.0),
         ("a", "2024-01-01 12:00:00", 7.0)],
        "g string, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    r = theil_sen(df, "g", "ts", "value").collect()[0]
    assert r.n_days == 1 and r.slope_e6 is None
