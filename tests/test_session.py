"""Session auto-sizing (SCALE_r03.json finding 5, promoted from bench.py
into the engine default): shuffle-partition upper bound and scan split
size derive from the largest input's bytes; AQE coalesces down."""

import os

import pytest

from spork_spark.session import _input_bytes, autosize_conf, get_spark

SF1 = os.path.join(os.path.dirname(os.path.dirname(__file__)), "testdata_sf1")


def _sf1() -> str:
    """Self-provision the gitignored sf1 fixture instead of silently
    skipping on a fresh boot (round-8 verdict item 6; ~2 min once)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(SF1), "tools"))
    from make_scale import ensure_sf1
    return ensure_sf1(SF1)


def test_autosize_small_input_floors_at_cores():
    # sf0.1-sized input (~15 MB): upper bound floors at the core count;
    # AQE coalesces the actual count down at runtime.
    conf = autosize_conf(15 * 1024 * 1024, cores=32)
    assert conf["spark.sql.shuffle.partitions"] == "32"
    # scan splits floor at 4 MB (never slice a small file to confetti)
    assert conf["spark.sql.files.maxPartitionBytes"] == str(4 * 1024 * 1024)


def test_autosize_sf1_shape():
    # sf1 fixture shape (~176 MB lineitem over 16 files): ~58 partitions
    # (> the 8 that left `distinct` at 1.70 s) and small enough scan
    # splits that the 16-file layout feeds all 32 cores (the default
    # 128 MB splits would cap the scan at 16 tasks).
    b = 176 * 1024 * 1024
    conf = autosize_conf(b, cores=32)
    parts = int(conf["spark.sql.shuffle.partitions"])
    split = int(conf["spark.sql.files.maxPartitionBytes"])
    assert 48 <= parts <= 64
    assert split <= 6 * 1024 * 1024
    assert b // split >= 32


def test_autosize_capped_and_empty():
    assert int(autosize_conf(10 ** 15, cores=32)
               ["spark.sql.shuffle.partitions"]) == 2048
    assert autosize_conf(0) == {}


def test_input_bytes_picks_largest_table():
    _sf1()
    b = _input_bytes(SF1)
    line = os.path.join(SF1, "lineitem.parquet")
    expect = (sum(os.path.getsize(os.path.join(line, f))
                  for f in os.listdir(line) if not f.startswith("_"))
              if os.path.isdir(line) else os.path.getsize(line))
    assert b == expect > 0


def test_get_spark_applies_autosize_at_runtime(spark):
    _sf1()
    if "SPARK_GRAFT_SHUFFLE" in os.environ:
        pytest.skip("explicit override active")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        s = get_spark(data_dir=SF1)
        expect = autosize_conf(_input_bytes(SF1), None)
        assert (s.conf.get("spark.sql.shuffle.partitions")
                == expect["spark.sql.shuffle.partitions"])
        assert (s.conf.get("spark.sql.files.maxPartitionBytes")
                == expect["spark.sql.files.maxPartitionBytes"])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        spark.conf.unset("spark.sql.files.maxPartitionBytes")


def test_input_bytes_recurses_into_partitioned_tables(tmp_path):
    """A Hive-partitioned table (table/part=x/file) must be measured by
    its FILE bytes, not its directory inodes — otherwise autosizing
    reproduces the static-undersizing failure it exists to prevent
    (round-4 review finding)."""
    t = tmp_path / "events.parquet"
    for part in ("day=1", "day=2"):
        d = t / part
        d.mkdir(parents=True)
        (d / "part-0.parquet").write_bytes(b"x" * 10_000)
        (d / "_metadata").write_bytes(b"y" * 5_000)     # excluded
    (tmp_path / "_SUCCESS").write_bytes(b"")
    assert _input_bytes(str(tmp_path)) == 20_000
