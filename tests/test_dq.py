"""Tests for operators/dq.py declarative data-quality validation."""

import pytest
from pyspark.sql import functions as F

from spork_spark.operators import dq_validate


def _run(df, rules):
    return {r.rule: (r.kind, r.n_violations)
            for r in dq_validate(df, rules).collect()}


def test_rowwise_rules_share_one_pass(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 50.0), (2, "zz", -1.0), (None, "a", None)],
        "k bigint, s string, v double")
    rules = [{"kind": "not_null", "col": "k"},
             {"kind": "accepted_values", "col": "s", "values": ["a", "b"]},
             {"kind": "in_range", "col": "v", "lo": 0, "hi": 10},
             {"kind": "matches", "col": "s", "pattern": "[a-y]+"}]
    got = _run(df, rules)
    assert got["not_null(k)"] == ("not_null", 1)
    assert got["accepted_values(s)"] == ("accepted_values", 1)   # zz
    assert got["in_range(v,0,10)"] == ("in_range", 2)            # 50, -1
    assert got["matches(s)"] == ("matches", 1)                   # zz
    # single scan for all four rules
    plan = dq_validate(df, rules)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_unique_counts_rows_beyond_first(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k bigint")
    got = _run(df, [{"kind": "unique", "cols": ["k"]}])
    assert got["unique(k)"] == ("unique", 2)


def test_foreign_key_orphans(spark):
    df = spark.createDataFrame([(1,), (2,), (9,), (None,)], "k bigint")
    ref = spark.createDataFrame([(1,), (2,)], "rk bigint")
    got = _run(df, [{"kind": "foreign_key", "col": "k",
                     "ref": ref, "ref_col": "rk"}])
    assert got["foreign_key(k)"] == ("foreign_key", 1)      # 9 only


def test_unknown_kind_raises(spark):
    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError):
        dq_validate(df, [{"kind": "nope", "col": "k"}])


def test_k_anonymity_flags_small_groups(spark):
    from spork_spark.operators import k_anonymity
    df = spark.createDataFrame(
        [("10001", 30), ("10001", 30), ("10001", 30),
         ("10002", 40), ("10002", 40),
         ("99999", 77)],
        "zip string, age int")
    out = k_anonymity(df, ["zip", "age"], k=3).collect()
    got = {(r["zip"], r["age"]): r["group_size"] for r in out}
    assert got == {("99999", 77): 1, ("10002", 40): 2}


def test_k_anonymity_null_handling(spark):
    from spork_spark.operators import k_anonymity
    df = spark.createDataFrame(
        [("a",), ("a",), (None,)], "zip string")
    # null is its own quasi value by default
    out = k_anonymity(df, ["zip"], k=2).collect()
    assert [(r["zip"], r["group_size"]) for r in out] == [(None, 1)]
    # and excluded entirely with null_as_value=False
    assert k_anonymity(df, ["zip"], k=2, null_as_value=False).count() == 0


def test_k_anonymity_validates_args(spark):
    import pytest
    from spork_spark.operators import k_anonymity
    df = spark.createDataFrame([("a",)], "zip string")
    with pytest.raises(ValueError):
        k_anonymity(df, [], k=3)
    with pytest.raises(ValueError):
        k_anonymity(df, ["zip"], k=1)


def test_benford_digits_counts_and_ppm(spark):
    from spork_spark.operators import benford_digits
    vals = [1.0, 12.5, 19.9, 2.0, 0.0, None, -3.5, 0.071, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r.digit: r for r in benford_digits(df, "x").collect()}
    assert set(out) == set(range(1, 10))
    assert out[1].n == 4                 # 1.0, 12.5, 19.9, 100.0
    assert out[2].n == 1 and out[3].n == 1 and out[7].n == 1
    assert out[9].n == 0                 # absent digit still reported
    assert out[1].actual_ppm == 4 * 1000000 // 7
    assert out[1].expected_ppm == 301029


def test_benford_rejects_uniform_accepts_exponential(spark):
    """Exponentially-spread amounts follow Benford; a uniform [100,999]
    column concentrates nowhere near it — max deviation tells them apart."""
    from spork_spark.operators import benford_digits
    import pyspark.sql.functions as F
    expo = spark.createDataFrame(
        [(1.07 ** i,) for i in range(1, 400)], "x double")
    unif = spark.createDataFrame(
        [(float(100 + i),) for i in range(900)], "x double")
    def maxdev(df):
        return (benford_digits(df, "x")
                .agg(F.max(F.abs(F.col("actual_ppm")
                                 - F.col("expected_ppm"))))
                .first()[0])
    assert maxdev(expo) < 25000          # within 2.5% of Benford
    assert maxdev(unif) > 60000          # uniform: digit 1 hugely off


def test_vector_rule_flags_malformed_embeddings(spark):
    from spork_spark.operators import dq_validate
    rows = [(1, [1.0, 2.0]), (2, [1.0]),           # wrong dim
            (3, [float("nan"), 1.0]),              # NaN element
            (4, None),                             # null vector: passes
            (5, [0.5, None])]                      # null element
    df = spark.createDataFrame(rows,
                               "vec_id bigint, embedding array<double>")
    out = {r.rule: r.n_violations for r in dq_validate(
        df, [{"kind": "vector", "col": "embedding", "dim": 2},
             {"kind": "not_null", "col": "embedding"}]).collect()}
    assert out["vector(embedding,2)"] == 3
    assert out["not_null(embedding)"] == 1
