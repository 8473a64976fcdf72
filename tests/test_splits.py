"""Tests for leakage-safe splitting (operators/splits.py) and the
small-file compaction planner (operators/layout.py compaction_plan)."""

import pytest
from pyspark.sql import functions as F

from spork_spark.operators import compaction_plan, leakage_safe_split
from spork_spark.operators.splits import split_assignment


def _docs(spark, n=200):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_cluster_members_share_split(spark):
    docs = _docs(spark)
    # chain 1-2-3 and pair 10-11: transitivity must hold for the chain
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    out = leakage_safe_split(docs, "doc_id", pairs).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    assert split[1] == split[2] == split[3]
    assert split[10] == split[11]
    assert len(out) == 200
    assert set(r["split"] for r in out) <= {"train", "test"}


def test_split_deterministic_and_salted(spark):
    docs = _docs(spark, 100)
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    a = {r["doc_id"]: r["split"]
         for r in leakage_safe_split(docs, "doc_id", pairs).collect()}
    b = {r["doc_id"]: r["split"]
         for r in leakage_safe_split(docs, "doc_id", pairs).collect()}
    assert a == b
    c = {r["doc_id"]: r["split"]
         for r in leakage_safe_split(docs, "doc_id", pairs,
                                     salt="other").collect()}
    assert a != c  # a different salt re-rolls at least some assignments


def test_split_weights_roughly_hold(spark):
    docs = _docs(spark, 2000)
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = leakage_safe_split(
        docs, "doc_id", pairs,
        splits=[("train", 80), ("valid", 10), ("test", 10)]).collect()
    frac = {s: sum(1 for r in out if r["split"] == s) / len(out)
            for s in ("train", "valid", "test")}
    assert 0.7 < frac["train"] < 0.9
    assert 0.05 < frac["valid"] < 0.15
    assert 0.05 < frac["test"] < 0.15


def test_split_rejects_bad_weights(spark):
    docs = _docs(spark, 10)
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    with pytest.raises(ValueError):
        leakage_safe_split(docs, "doc_id", pairs, splits=[("train", 50)])
    with pytest.raises(ValueError):
        leakage_safe_split(docs, "doc_id", pairs,
                           splits=[("a", 101), ("b", -1)])


def test_compaction_plan_next_fit(spark):
    inv = spark.createDataFrame(
        [("a", 60), ("b", 50), ("c", 10), ("d", 200), ("e", 30)],
        "path string, size_bytes long")
    out = {r["path"]: r["compaction_group"]
           for r in compaction_plan(inv, "size_bytes", 100,
                                    order_cols=["path"]).collect()}
    # prefix sums (exclusive): a=0, b=60, c=110, d=120, e=320
    assert out == {"a": 0, "b": 0, "c": 1, "d": 1, "e": 3}


def test_compaction_plan_oversize_file_isolated(spark):
    inv = spark.createDataFrame(
        [("a", 500), ("b", 40), ("c", 40)],
        "path string, size_bytes long")
    out = {r["path"]: r["compaction_group"]
           for r in compaction_plan(inv, "size_bytes", 100,
                                    order_cols=["path"]).collect()}
    # a spans groups 0..4 alone; b and c start at prefix 500 -> group 5
    assert out["a"] == 0 and out["b"] == 5 and out["c"] == 5


def test_compaction_plan_rejects_bad_target(spark):
    inv = spark.createDataFrame([("a", 1)], "path string, size_bytes long")
    with pytest.raises(ValueError):
        compaction_plan(inv, "size_bytes", 0)


def test_consistent_sample_join_preserving(spark):
    """sample(A) join sample(B) == sample(A join B) — the contract."""
    import pyspark.sql.functions as F
    from spork_spark.operators import consistent_sample
    a = spark.range(0, 2000).select(F.col("id").alias("k"),
                                    (F.col("id") * 2).alias("x"))
    b = spark.range(0, 2000).select(F.col("id").alias("k"),
                                    (F.col("id") * 3).alias("y"))
    sa = consistent_sample(a, "k", 20)
    sb = consistent_sample(b, "k", 20)
    joined_then_sampled = consistent_sample(a.join(b, "k"), "k", 20)
    sampled_then_joined = sa.join(sb, "k")
    got = sorted(map(tuple, sampled_then_joined.collect()))
    want = sorted(map(tuple, joined_then_sampled.collect()))
    assert got == want and len(got) > 100
    # rate lands near 20%
    assert abs(sa.count() / 2000 - 0.2) < 0.05


def test_consistent_sample_stable_under_growth(spark):
    import pyspark.sql.functions as F
    from spork_spark.operators import consistent_sample
    small = spark.range(0, 500).select(F.col("id").alias("k"))
    big = spark.range(0, 5000).select(F.col("id").alias("k"))
    s_small = {r.k for r in consistent_sample(small, "k", 10).collect()}
    s_big = {r.k for r in consistent_sample(big, "k", 10).collect()}
    assert s_small == {k for k in s_big if k < 500}
