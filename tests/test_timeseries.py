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
