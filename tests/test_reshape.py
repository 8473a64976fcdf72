"""pivot_table / unpivot (operators/reshape.py) + cohort retention and
fuzzy pair mining edges."""

import datetime as dt

import pytest

from spork_spark.operators.reshape import pivot_table, unpivot


def test_pivot_explicit_values_and_fill(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 3.0), ("b", "y", 4.0)],
        "k string, p string, v double")
    out = {r.k: (r.x, r.y) for r in
           pivot_table(df, ["k"], "p", ["x", "y"], fill=0).collect()}
    assert out == {"a": (2, 1), "b": (0, 1)}     # b/x filled to 0


def test_pivot_sum_agg(spark):
    df = spark.createDataFrame([("a", "x", 1.0), ("a", "x", 2.0)],
                               "k string, p string, v double")
    row = pivot_table(df, ["k"], "p", ["x"], agg_col="v",
                      agg="sum").collect()[0]
    assert row.x == 3.0


def test_pivot_requires_values(spark):
    df = spark.createDataFrame([("a", "x", 1.0)],
                               "k string, p string, v double")
    with pytest.raises(ValueError):
        pivot_table(df, ["k"], "p", [])
    with pytest.raises(ValueError):
        pivot_table(df, ["k"], "p", ["x"], agg="sum")   # no agg_col


def test_unpivot_roundtrip_drops_missing(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "y", 3.0)],
        "k string, p string, v double")
    wide = pivot_table(df, ["k"], "p", ["x", "y"])   # no fill: b/x null
    long = unpivot(wide, ["k"], ["x", "y"], "p", "cnt")
    got = sorted((r.k, r.p, r.cnt) for r in long.collect())
    assert got == [("a", "x", 1), ("a", "y", 1), ("b", "y", 1)]


def test_cohort_retention_matrix(spark):
    def ts(d, h=0):
        return dt.datetime(2024, 1, d, h)
    rows = [
        (1, ts(1)), (1, ts(1, 5)), (1, ts(3)),     # cohort 1/1, days 0+2
        (2, ts(1)), (2, ts(2)),                    # cohort 1/1, days 0+1
        (3, ts(2)), (3, ts(3)),                    # cohort 1/2, days 0+1
    ]
    from spork_spark.operators.behavior import cohort_retention
    df = spark.createDataFrame(rows, "u bigint, ts timestamp")
    got = {(str(r.cohort), r.day_offset): r.n_users
           for r in cohort_retention(df, "u", "ts").collect()}
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1,
                   ("2024-01-01", 2): 1, ("2024-01-02", 0): 1,
                   ("2024-01-02", 1): 1}


def test_fuzzy_pairs_matches_bruteforce(spark):
    """FastSS blocking + levenshtein verify == brute-force distance-1
    pairs (substitution, insertion, deletion, and a >1 non-pair)."""
    names = ["kitten", "mitten", "kittens", "kitte", "sitting", "kitten"]
    rows = [(i, n) for i, n in enumerate(names)]
    from spork_spark.operators.dedup import edit_distance_pairs
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = {(r.id_a, r.id_b) for r in
           edit_distance_pairs(df, "id", "s").collect()}

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {(i, j) for i, a in rows for j, b in rows
            if i < j and lev(a, b) <= 1}
    assert got == want
    assert (0, 5) in got            # identical strings pair (distance 0)
    assert (0, 4) not in got        # kitten↔sitting is distance 2
