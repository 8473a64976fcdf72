"""MERGE-style upsert (operators/upsert.py): update/insert/delete
semantics, version resolution, and the no-shuffle-on-base plan shape."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from spork_spark.operators.upsert import merge_upsert


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k bigint, s string, p double")


def test_upsert_update_insert_delete(spark, base):
    upd = spark.createDataFrame(
        [(2, "B", 200.0, False),      # update
         (5, "e", 50.0, False),       # insert
         (3, "-", 0.0, True)],        # delete
        "k bigint, s string, p double, del boolean")
    out = sorted(map(tuple, merge_upsert(base, upd, ["k"],
                                         delete_col="del").collect()))
    assert out == [(1, "a", 10.0), (2, "B", 200.0),
                   (4, "d", 40.0), (5, "e", 50.0)]


def test_upsert_version_resolution(spark, base):
    upd = spark.createDataFrame(
        [(2, "v1", 21.0, 1), (2, "v2", 22.0, 2), (2, "v0", 20.5, 0)],
        "k bigint, s string, p double, v int")
    out = {r.k: (r.s, r.p) for r in
           merge_upsert(base, upd, ["k"], version_col="v").collect()}
    assert out[2] == ("v2", 22.0)     # only the max version applies
    assert len(out) == 4


def test_upsert_delete_beats_stale_update(spark, base):
    # the delete is the LATEST version: the key must go away
    upd = spark.createDataFrame(
        [(3, "stale", 31.0, 1, False), (3, "-", 0.0, 2, True)],
        "k bigint, s string, p double, v int, del boolean")
    out = sorted(r.k for r in
                 merge_upsert(base, upd, ["k"], version_col="v",
                              delete_col="del").collect())
    assert out == [1, 2, 4]


def test_upsert_missing_key_raises(spark, base):
    upd = spark.createDataFrame([(1, "x")], "j bigint, s string")
    with pytest.raises(ValueError):
        merge_upsert(base, upd, ["k"])


def test_upsert_base_never_shuffles(spark, base):
    """The snapshot side must see a BroadcastHashJoin LeftAnti and no
    Exchange on its branch — the property that lets a 100 TB base absorb
    a small change batch as a map-only pass."""
    upd = spark.createDataFrame([(2, "B", 200.0)],
                                "k bigint, s string, p double")
    out = merge_upsert(base, upd, ["k"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_upsert_max_version_tie_is_deterministic(spark, base):
    """Several update rows AT the max version resolve by the remaining
    columns descending — same survivor on every run (round-4 advice:
    no arbitrary dropDuplicates survivor)."""
    upd = spark.createDataFrame(
        [(1, "x", 1.0, 5), (1, "z", 2.0, 5), (1, "y", 9.0, 5),
         (2, "q", 7.0, 3)],
        "k bigint, s string, p double, v int")
    outs = set()
    for _ in range(3):
        r = merge_upsert(base, upd, ["k"], version_col="v") \
            .where("k = 1").collect()
        assert len(r) == 1
        outs.add((r[0].s, r[0].p))
    assert outs == {("z", 2.0)}     # max s wins the v-tie, then p
