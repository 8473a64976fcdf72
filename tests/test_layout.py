"""Z-order layout (operators/layout.py): Morton key arithmetic vs a
Python replay, locality property, and the rewrite's plan shape."""

import io
import contextlib

import pytest

from spork_spark.operators.layout import zorder_by, zorder_key


def _interleave(a, b, bits):
    z = 0
    for p in range(bits):
        z |= ((a >> p) & 1) << (2 * p)
        z |= ((b >> p) & 1) << (2 * p + 1)
    return z


def test_zorder_key_matches_python_replay(spark):
    rows = [(i, j) for i in range(16) for j in range(16)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {(r.x, r.y): r.zk for r in
           zorder_key(df, ["x", "y"], bits=4, out_col="zk").collect()}
    # min=0, max=15, bits=4 → scaling is identity
    for (x, y), z in got.items():
        assert z == _interleave(x, y, 4), (x, y)


def test_zorder_locality_beats_linear_sort(spark):
    """The defining property: points close in BOTH dims are close in z.
    Quadrant (x<8, y<8) must occupy one contiguous z-range — with a
    linear sort on x alone, y<8 rows scatter over the whole range."""
    rows = [(i, j) for i in range(16) for j in range(16)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    out = zorder_key(df, ["x", "y"], bits=4, out_col="zk").collect()
    quad = [r.zk for r in out if r.x < 8 and r.y < 8]
    assert max(quad) - min(quad) + 1 == len(quad) == 64   # contiguous


def test_zorder_constant_column_and_nulls(spark):
    df = spark.createDataFrame([(1, None), (1, 5), (1, 9)],
                               "x bigint, y bigint")
    got = sorted(((r.y is None, r.y), r.zk) for r in
                 zorder_key(df, ["x", "y"], bits=4,
                            out_col="zk").collect())
    # sort puts nulls last: got = [(y=5,), (y=9,), (y=None,)]
    # x constant → contributes 0; null y scales as the min (5)
    assert got[2][1] == got[0][1]        # null ≡ min value
    assert got[1][1] > got[0][1]


def test_zorder_width_guard(spark):
    df = spark.createDataFrame([(1, 1)], "x bigint, y bigint")
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)
    with pytest.raises(ValueError):
        zorder_key(df, [], bits=8)


def test_zorder_by_plan_rangepartitions_on_key(spark):
    df = spark.createDataFrame([(i, i % 7) for i in range(100)],
                               "x bigint, y bigint")
    out = zorder_by(df, ["x", "y"], bits=4, num_partitions=4)
    assert out.columns == ["x", "y"]                  # key dropped
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "rangepartitioning" in plan
    assert "Sort" in plan


def test_zorder_wide_range_no_int64_wrap(spark):
    """Snowflake-scale 64-bit IDs: span above 2^55 used to wrap x*m in
    int64 and corrupt the key (round-4 advice item). The double-scaled
    key must stay monotonic in each column."""
    big = 1 << 60
    rows = [(i * (big // 16), 0) for i in range(17)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = [r.zk for r in
           zorder_key(df, ["x", "y"], bits=8, out_col="zk")
           .orderBy("x").collect()]
    assert all(0 <= z for z in got), got
    assert got == sorted(got), got          # monotonic in x (y const)
    assert got[-1] > got[0]                 # spans the scaled range
