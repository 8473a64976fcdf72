"""snapshot_diff + table_fingerprint (operators/diff.py): CDC
classification semantics, null-safety, and the order/partition
invariance that makes the fingerprint an anti-entropy primitive."""

import pytest
from pyspark.sql import functions as F

from spork_spark.operators import (fingerprint_compare, snapshot_diff,
                                   table_fingerprint)


@pytest.fixture(scope="module")
def versions(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, None, 40)],
        "k int, s string, v int")
    new = spark.createDataFrame(
        [(2, "b", 20),        # unchanged -> dropped
         (3, "c", 30),        # null -> 30: changed
         (4, None, 40),       # null == null: unchanged -> dropped
         (5, "e", 50)],       # added
        "k int, s string, v int")
    return old, new


def test_snapshot_diff_classifies(versions):
    old, new = versions
    out = snapshot_diff(old, new, ["k"]).orderBy("k").collect()
    assert [(r.k, r.change_type) for r in out] == \
        [(1, "removed"), (3, "changed"), (5, "added")]
    by_k = {r.k: r for r in out}
    assert by_k[3].old_v is None and by_k[3].new_v == 30
    assert by_k[1].old_s == "a" and by_k[1].new_s is None
    assert by_k[5].new_s == "e" and by_k[5].old_s is None


def test_snapshot_diff_compare_subset(versions):
    old, new = versions
    # comparing only `s` makes key 3 unchanged (s is 'c' on both sides)
    out = snapshot_diff(old, new, ["k"], compare_cols=["s"]).collect()
    assert sorted((r.k, r.change_type) for r in out) == \
        [(1, "removed"), (5, "added")]


def test_fingerprint_order_and_partition_invariant(spark):
    rows = [(i, f"s{i % 7}", i * 3) for i in range(500)]
    a = spark.createDataFrame(rows, "k int, s string, v int")
    b = (spark.createDataFrame(list(reversed(rows)), "k int, s string, v int")
              .repartition(13))
    fa = table_fingerprint(a, num_buckets=16).collect()
    fb = table_fingerprint(b, num_buckets=16).collect()
    assert fa == fb
    assert sum(r.n_rows for r in fa) == 500
    assert fingerprint_compare(
        table_fingerprint(a, num_buckets=16),
        table_fingerprint(b, num_buckets=16), ["bucket"]).count() == 0


def test_fingerprint_detects_single_row_change(spark):
    rows = [(i, "x", i) for i in range(200)]
    a = spark.createDataFrame(rows, "k int, s string, v int")
    changed = [(i, "x", i if i != 137 else -1) for i in range(200)]
    b = spark.createDataFrame(changed, "k int, s string, v int")
    bad = fingerprint_compare(table_fingerprint(a, num_buckets=32),
                              table_fingerprint(b, num_buckets=32),
                              ["bucket"]).collect()
    # the one flipped row lands in 1 bucket (2 if old/new digests differ
    # in bucket, which they do with overwhelming probability)
    assert 1 <= len(bad) <= 2


def test_fingerprint_null_vs_empty_string(spark):
    a = spark.createDataFrame([(1, None)], "k int, s string")
    b = spark.createDataFrame([(1, "")], "k int, s string")
    fa = table_fingerprint(a, num_buckets=4).collect()
    fb = table_fingerprint(b, num_buckets=4).collect()
    assert fa != fb


def test_fingerprint_group_cols(spark):
    df = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")],
        "k int, s string, part string")
    out = table_fingerprint(df, cols=["k", "s"],
                            group_cols=["part"]).collect()
    assert [(r.part, r.n_rows) for r in out] == [("p1", 2), ("p2", 1)]


def test_fingerprint_single_shuffle_plan(spark):
    df = spark.createDataFrame([(i, "v") for i in range(100)],
                               "k int, s string")
    plan = table_fingerprint(df)._jdf.queryExecution().executedPlan() \
                                .toString()
    # partial + final hash aggregate around exactly one hash exchange
    # (the trailing rangepartitioning exchange sorts num_buckets rows)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "HashAggregate" in plan
