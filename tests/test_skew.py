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


def test_heavy_hitters_exact_vs_groupby(spark):
    """heavy_hitters must return exactly the values a plain
    GROUP BY ... HAVING returns — same counts — on a Zipf-ish key set
    spread over many partitions (so the Misra-Gries candidate stage
    and the cross-partition merge both matter)."""
    from spork_spark.operators.skew import heavy_hitters
    rows = []
    for v in range(1, 40):               # value v appears ~1000//v times
        rows += [(v,)] * (1000 // v)
    rows += [(None,)] * 17               # nulls excluded from both sides
    df = spark.createDataFrame(rows, "k int").repartition(13)
    got = sorted((r.k, r.cnt) for r in
                 heavy_hitters(df, "k", min_frac=0.05).collect())
    n = sum(1 for (v,) in rows if v is not None)
    from collections import Counter
    exact = Counter(v for (v,) in rows if v is not None)
    want = sorted((v, c) for v, c in exact.items()
                  if c * 1_000_000 >= 50_000 * n)
    assert got == want
    assert len(want) >= 3               # the threshold actually selects


def test_heavy_hitters_rejects_bad_frac(spark):
    import pytest as _pytest
    from spork_spark.operators.skew import heavy_hitters
    df = spark.createDataFrame([(1,)], "k int")
    with _pytest.raises(ValueError):
        heavy_hitters(df, "k", min_frac=0.0)


def test_aqe_splits_skewed_join_partition(spark):
    """`USING 'skewed'` maps to AQE skew-join conf (session.py) — pin
    that the machinery actually SPLITS a hot partition: one key carries
    ~50% of a 200k-row left side, thresholds sized to the fixture (the
    same proportional sizing a deployment does against its partition
    sizes), and the FINAL adaptive plan must carry the skew=true
    marker on the shuffle read. Evidence at sf1 scale: SKEW_r06.json
    (6M rows, 20% hot key: 0.86s AQE-off -> 0.52s split)."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            str(256 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes":
            str(128 * 1024),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # AQE's RUNTIME broadcast conversion has its own threshold —
        # leave either on and the join broadcasts instead of splitting
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7))
             .otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"))
        right = spark.range(50_000).select(F.col("id").alias("k"),
                                           (F.col("id") * 2).alias("w"))
        df = left.join(right, on="k")
        # execute THIS QueryExecution so the adaptive plan finalizes
        df._jdf.queryExecution().executedPlan().execute().count()
        final = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final or "isSkew=true" in final, final[:800]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
