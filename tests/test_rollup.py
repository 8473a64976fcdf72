"""time_rollup (operators/rollup.py) — hypertable-style multi-grain
rollup cascade — and inverted_index (operators/text.py)."""

import pytest
from pyspark.sql import functions as F

from spork_spark.operators import inverted_index, time_rollup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rollup_cascade_scans_raw_once(events):
    """The whole point of the cascade: coarser grains aggregate the
    finer AGGREGATE, never re-derive from raw — the final plan reads the
    checkpointed base, zero raw parquet scans per extra grain."""
    r = time_rollup(events, grains=("hour", "day"))
    assert plan_of(r).count("Scan parquet") == 0    # base checkpointed


def test_rollup_cascade_matches_direct_aggregation(events):
    """Day rows built hour→day must be IDENTICAL to a direct raw→day
    aggregation — exact decimal sums make the two paths bit-equal."""
    r = time_rollup(events, grains=("hour", "day"))
    day = r.filter(F.col("grain") == "day").drop("grain")
    direct = (events.groupBy(F.date_trunc("day", "ts").alias("bucket"),
                             "event_type")
              .agg(F.count(F.lit(1)).alias("cnt"),
                   F.sum(F.col("value").cast("decimal(18,2)"))
                    .cast("decimal(38,2)").alias("sum_value"),
                   F.min("value").alias("min_value"),
                   F.max("value").alias("max_value")))
    assert sorted(map(tuple, day.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_rollup_counts_reconcile_across_grains(events):
    r = time_rollup(events, grains=("hour", "day")).persist()
    per_grain = {row["grain"]: row["total"] for row in
                 r.groupBy("grain").agg(F.sum("cnt").alias("total"))
                  .collect()}
    n = events.count()
    assert per_grain == {"hour": n, "day": n}
    r.unpersist()


def test_rollup_rejects_unknown_grain(events):
    with pytest.raises(ValueError, match="unknown grain"):
        time_rollup(events, grains=("hour", "fortnight"))


def test_rollup_single_grain_has_no_checkpoint(events):
    """One grain ⇒ no double consumption ⇒ no materialization job."""
    r = time_rollup(events, grains=("hour",))
    p = plan_of(r)
    assert p.count("Scan parquet") == 1 and "ExistingRDD" not in p


def test_inverted_index_tf_and_df(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, None)],
        "doc_id long, text string")
    rows = {(r["token"], r["doc_id"]): (r["tf"], r["doc_freq"])
            for r in inverted_index(df).collect()}
    assert rows[("a", 1)] == (2, 2)
    assert rows[("a", 2)] == (1, 2)
    assert rows[("b", 1)] == (1, 1)
    assert rows[("c", 2)] == (1, 1)
    assert len(rows) == 4                      # null text contributes none


def test_inverted_index_min_df_prunes(spark):
    df = spark.createDataFrame(
        [(1, "x y"), (2, "x"), (3, "x Y")], "doc_id long, text string")
    out = inverted_index(df, min_df=2)
    toks = {r["token"] for r in out.collect()}
    assert toks == {"x", "y"}                  # lowercased: y in docs 1+3
    nocase = inverted_index(df, min_df=2, lowercase=False)
    assert {r["token"] for r in nocase.collect()} == {"x"}


def test_inverted_index_is_all_native(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    p = plan_of(inverted_index(df))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_rollup_week_does_not_tile_months(spark):
    """Weeks straddle month boundaries: ('week','month') must NOT cascade
    month from week buckets (round-4 review finding). Events in early
    February whose week starts in January must land in February's month
    row; week and month both derive from the day-bucketed base pass."""
    import datetime
    rows = [(datetime.datetime(2024, 1, 29, 5), "a", 1.0),   # Mon, wk of Jan 29
            (datetime.datetime(2024, 2, 1, 6), "a", 2.0),    # same ISO week!
            (datetime.datetime(2024, 2, 7, 7), "a", 4.0)]
    df = spark.createDataFrame(rows, "ts timestamp_ntz, event_type string, v double")
    out = time_rollup(df, value_col="v", grains=("week", "month"))
    months = {(r["bucket"].month, float(r["sum_value"]))
              for r in out.filter(F.col("grain") == "month").collect()}
    assert months == {(1, 1.0), (2, 6.0)}     # pre-fix: {(1, 3.0), (2, 4.0)}
    weeks = {(r["bucket"].isoformat()[:10], float(r["sum_value"]))
             for r in out.filter(F.col("grain") == "week").collect()}
    assert weeks == {("2024-01-29", 3.0), ("2024-02-05", 4.0)}
    # no 'day' rows leak out of the synthetic base
    assert out.filter(F.col("grain") == "day").count() == 0


def test_rollup_day_week_month_sources_correctly(spark):
    """('day','week','month'): week cascades from day, month from day
    (skipping week), and all three reconcile to the raw totals."""
    import datetime
    rows = [(datetime.datetime(2024, 1, 28, 3)
             + datetime.timedelta(days=i % 5), "a", 1.0)
            for i in range(10)]
    df = spark.createDataFrame(rows, "ts timestamp_ntz, event_type string, v double")
    out = time_rollup(df, value_col="v", grains=("day", "week", "month")).persist()
    totals = {r["grain"]: r["t"] for r in
              out.groupBy("grain").agg(F.sum("cnt").alias("t")).collect()}
    assert totals == {"day": 10, "week": 10, "month": 10}
    out.unpersist()


def test_rollup_merge_equals_full_recompute(spark):
    """Rollup(on_time) ⊕ Rollup(late) == Rollup(all) exactly, per grain
    and bucket — the late-data refresh never needs the raw history."""
    import datetime
    from spork_spark.operators import rollup_merge
    rows = [(datetime.datetime(2024, 1, 1 + h // 24, h % 24),
             "a" if h % 2 else "b", float(h) + 0.25) for h in range(48)]
    df = spark.createDataFrame(
        rows, "ts timestamp_ntz, event_type string, value double")
    on_time = df.filter(F.dayofmonth("ts") == 1)
    late = df.filter(F.dayofmonth("ts") == 2)
    merged = rollup_merge(time_rollup(on_time), time_rollup(late))
    direct = time_rollup(df)
    key = lambda r: (r["grain"], r["bucket"], r["event_type"])
    got = {key(r): (r["cnt"], r["sum_value"], r["min_value"],
                    r["max_value"]) for r in merged.collect()}
    want = {key(r): (r["cnt"], r["sum_value"], r["min_value"],
                     r["max_value"]) for r in direct.collect()}
    assert got == want


def test_rollup_merge_is_associative(spark):
    """(s ⊕ d1) ⊕ d2 == s ⊕ (d1 ⊕ d2) — merges chain."""
    import datetime
    from spork_spark.operators import rollup_merge
    rows = [(datetime.datetime(2024, 1, 1 + i % 3, i % 24), "x",
             float(i)) for i in range(30)]
    df = spark.createDataFrame(
        rows, "ts timestamp_ntz, event_type string, value double")
    parts = [time_rollup(df.filter(F.dayofmonth("ts") == d))
             for d in (1, 2, 3)]
    left = rollup_merge(rollup_merge(parts[0], parts[1]), parts[2])
    right = rollup_merge(parts[0], rollup_merge(parts[1], parts[2]))
    k = lambda r: (r["grain"], r["bucket"], r["event_type"])
    a = {k(r): (r["cnt"], r["sum_value"]) for r in left.collect()}
    b = {k(r): (r["cnt"], r["sum_value"]) for r in right.collect()}
    assert a == b
