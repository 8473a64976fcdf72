"""Skew-handling operators: salted join result-equivalence to plain join."""

from pyspark.sql import functions as F

from spork_spark.operators import salted_join, skew_histogram


def test_salted_join_matches_plain_join(spark):
    # heavily skewed left: 90% of rows share key 1
    left = spark.createDataFrame(
        [(1 if i % 10 else i, f"l{i}") for i in range(1000)],
        "k int, lv string")
    right = spark.createDataFrame([(i, f"r{i}") for i in range(100)],
                                  "j int, rv string")
    plain = left.join(right, on=left["k"] == right["j"], how="inner") \
                .select("k", "lv", "rv")
    salted = salted_join(left, right, ["k"], ["j"], salt=8) \
        .select("k", "lv", "rv")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k int, lv string")
    right = spark.createDataFrame([(1, "x")], "j int, rv string")
    out = salted_join(left, right, ["k"], ["j"], how="left", salt=4)
    got = sorted((r.k, r.rv) for r in out.select("k", "rv").collect())
    assert got == [(1, "x"), (99, None)]


def test_skew_histogram(spark):
    df = spark.createDataFrame([(1,)] * 9 + [(2,)], "k int")
    top = skew_histogram(df, "k", top=1).collect()
    assert top[0].k == 1 and top[0].cnt == 9
