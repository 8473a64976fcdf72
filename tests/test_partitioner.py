"""PARTITION BY <class> — custom placement functions (SURVEY.md §2.1
clause table; Pig's Hadoop Partitioner hook). The engine honors a
REGISTERED Python function via rdd.partitionBy on the group output;
unregistered names keep the accepted-and-ignored behavior with a
warning. Results are placement-invariant in all cases."""

import warnings

import pytest
from pyspark.sql import functions as F

from spork_spark import Engine
from spork_spark.parser import run_script

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def eng(spark):
    return Engine(spark)


def _misplaced(df, key, n):
    got = df.withColumn("pid", F.spark_partition_id())
    return got.filter(F.pmod(F.col(key), F.lit(n)) != F.col("pid")).count()


def test_fused_group_honors_registered_partitioner(eng):
    eng.register_partitioner("my.pkg.ModPart", lambda k: int(k))
    rels = run_script(eng, f"""
        o = LOAD '{SF}/orders.parquet';
        g = GROUP o BY o_custkey PARTITION BY my.pkg.ModPart PARALLEL 4;
        s = FOREACH g GENERATE group AS custkey, COUNT_STAR(o) AS n;
    """)
    df = rels["s"].df()
    assert df.rdd.getNumPartitions() == 4
    assert _misplaced(df, "custkey", 4) == 0
    # content identical to a plain group
    plain = run_script(eng, f"""
        o = LOAD '{SF}/orders.parquet';
        g = GROUP o BY o_custkey;
        s = FOREACH g GENERATE group AS custkey, COUNT_STAR(o) AS n;
    """)["s"].df()
    assert sorted(map(tuple, df.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_unfused_bag_group_honors_partitioner(eng):
    eng.register_partitioner("my.pkg.ModPart", lambda k: int(k))
    rels = run_script(eng, f"""
        o = LOAD '{SF}/orders.parquet';
        g = GROUP o BY o_custkey PARTITION BY my.pkg.ModPart PARALLEL 4;
    """)
    assert _misplaced(rels["g"].df(), "group", 4) == 0


def test_cogroup_honors_partitioner(eng):
    eng.register_partitioner("my.pkg.ModPart", lambda k: int(k))
    rels = run_script(eng, f"""
        c = LOAD '{SF}/customer.parquet';
        o = LOAD '{SF}/orders.parquet';
        g = COGROUP c BY c_custkey, o BY o_custkey
            PARTITION BY my.pkg.ModPart PARALLEL 4;
    """)
    assert _misplaced(rels["g"].df(), "group", 4) == 0


def test_unregistered_class_warns_and_falls_back(eng):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rels = run_script(eng, f"""
            o = LOAD '{SF}/orders.parquet';
            g = GROUP o BY o_custkey PARTITION BY org.example.Unknown;
            s = FOREACH g GENERATE group AS custkey, COUNT_STAR(o) AS n;
        """)
        n = rels["s"].df().count()
    assert n > 0
    assert any("no placement function" in str(x.message) for x in w)


def test_partitioner_with_unprojected_key_warns_and_skips(eng):
    eng.register_partitioner("my.pkg.ModPart", lambda k: int(k))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rels = run_script(eng, f"""
            o = LOAD '{SF}/orders.parquet';
            g = GROUP o BY o_custkey PARTITION BY my.pkg.ModPart;
            s = FOREACH g GENERATE COUNT_STAR(o) AS n;
        """)
        assert rels["s"].df().count() > 0
    assert any("not projected" in str(x.message) for x in w)


def test_compound_key_partitioner_receives_tuple(eng):
    seen = []

    def by_first(k):
        return int(k[0])          # k is the (returnflag, linestatus) tuple

    eng.register_partitioner("my.pkg.TuplePart",
                             lambda k: len(str(k[0])) + len(str(k[1])))
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        g = GROUP li BY (l_returnflag, l_linestatus)
            PARTITION BY my.pkg.TuplePart PARALLEL 3;
        s = FOREACH g GENERATE group.l_returnflag AS rf,
                               group.l_linestatus AS ls,
                               COUNT_STAR(li) AS n;
    """)
    df = rels["s"].df().withColumn("pid", F.spark_partition_id())
    rows = df.collect()
    assert len(rows) == 6
    for r in rows:
        assert r["pid"] == (len(r["rf"]) + len(r["ls"])) % 3


def test_reordered_key_projection_keeps_declared_order(eng):
    """FOREACH projecting the key fields in a DIFFERENT order than the
    GROUP BY declaration must still hand fn the key in DECLARED order
    (round-4 review finding: projection order must not leak into the
    getPartition contract)."""
    eng.register_partitioner("my.pkg.TuplePart",
                             lambda k: len(str(k[0])))   # k[0] = returnflag
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        g = GROUP li BY (l_returnflag, l_linestatus)
            PARTITION BY my.pkg.TuplePart PARALLEL 3;
        s = FOREACH g GENERATE group.l_linestatus AS ls,
                               group.l_returnflag AS rf,
                               COUNT_STAR(li) AS n;
    """)
    df = rels["s"].df().withColumn("pid", F.spark_partition_id())
    for r in df.collect():
        assert r["pid"] == len(r["rf"]) % 3      # rf, not ls


def test_partial_key_projection_warns_and_skips(eng):
    eng.register_partitioner("my.pkg.TuplePart", lambda k: 0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rels = run_script(eng, f"""
            li = LOAD '{SF}/lineitem.parquet';
            g = GROUP li BY (l_returnflag, l_linestatus)
                PARTITION BY my.pkg.TuplePart;
            s = FOREACH g GENERATE group.l_returnflag AS rf,
                                   COUNT_STAR(li) AS n;
        """)
        assert rels["s"].df().count() > 0
    assert any("full group key" in str(x.message) for x in w)


def test_cogroup_agg_fusion_bails_on_partitioner(eng):
    """COGROUP+IsEmpty whose bags would fuse to per-side aggregates must
    NOT fuse when PARTITION BY names a registered placement function —
    the fused shape would drop the observable part-file placement
    (r10 advisor). The bag path runs instead and honors it."""
    eng.register_partitioner("my.pkg.ModPart", lambda k: int(k))
    script = f"""
        c = LOAD '{SF}/customer.parquet';
        o = LOAD '{SF}/orders.parquet';
        cg = COGROUP c BY c_custkey, o BY o_custkey
             PARTITION BY my.pkg.ModPart PARALLEL 4;
        anti = FILTER cg BY IsEmpty(o);
        out = FOREACH anti GENERATE group AS custkey, COUNT_STAR(c) AS n;
    """
    df = run_script(eng, script)["out"].df()
    # fusion bailed: the bag path ran and applied the placement
    # function (the fused shape dropped it — every group landed by
    # Catalyst hash instead of fn(key) % n)
    assert _misplaced(df, "custkey", 4) == 0
    # and values match the fused shape without the partitioner clause
    plain = run_script(eng, f"""
        c = LOAD '{SF}/customer.parquet';
        o = LOAD '{SF}/orders.parquet';
        cg = COGROUP c BY c_custkey, o BY o_custkey;
        anti = FILTER cg BY IsEmpty(o);
        out = FOREACH anti GENERATE group AS custkey, COUNT_STAR(c) AS n;
    """)["out"].df()
    assert sorted(map(tuple, df.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_cogroup_agg_fusion_honors_parallel(eng):
    """PARALLEL on a fused COGROUP sets the reduce partition count, the
    same observable _c_cogroup honors (r10 advisor)."""
    script = f"""
        c = LOAD '{SF}/customer.parquet';
        o = LOAD '{SF}/orders.parquet';
        cg = COGROUP c BY c_custkey, o BY o_custkey PARALLEL 3;
        anti = FILTER cg BY IsEmpty(o);
        out = FOREACH anti GENERATE group AS custkey, COUNT_STAR(c) AS n;
    """
    df = run_script(eng, script)["out"].df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan          # still fused
    assert df.rdd.getNumPartitions() == 3      # PARALLEL honored
