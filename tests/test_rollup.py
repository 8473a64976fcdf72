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
