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


def _files_overlapping_box(path, s_lo, s_hi, p_lo, p_hi):
    """Files whose (l_suppkey, l_partkey) min/max footer stats overlap
    the box — exactly the files a stats-pruning reader must touch."""
    import os

    import pyarrow.parquet as pq
    hit, total = 0, 0
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        smin = min(md.row_group(i).column(0).statistics.min
                   for i in range(md.num_row_groups))
        smax = max(md.row_group(i).column(0).statistics.max
                   for i in range(md.num_row_groups))
        pmin = min(md.row_group(i).column(1).statistics.min
                   for i in range(md.num_row_groups))
        pmax = max(md.row_group(i).column(1).statistics.max
                   for i in range(md.num_row_groups))
        if smax >= s_lo and smin <= s_hi and pmax >= p_lo and pmin <= p_hi:
            hit += 1
    return hit, total


def test_zorder_data_skipping_beats_single_column_sort(spark, tmp_path):
    """The PAYOFF, not just the key (round-4 verdict item 5): store
    lineitem z-ordered on (l_suppkey, l_partkey) vs range-sorted on
    l_suppkey alone, then count files whose footer min/max overlap a
    two-column box filter. The z-order layout must touch fewer files,
    and a partkey-only filter must prune files AT ALL (the single-sort
    layout cannot: every file spans the full partkey range)."""
    from pyspark.sql import functions as F
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet") \
        .select("l_suppkey", "l_partkey")
    n_files = 64
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "ssort")
    zorder_by(li, ["l_suppkey", "l_partkey"], bits=8,
              num_partitions=n_files).write.parquet(zpath)
    li.repartitionByRange(n_files, F.col("l_suppkey")) \
      .sortWithinPartitions("l_suppkey").write.parquet(spath)

    s_lo, s_hi = li.agg(F.min("l_suppkey"), F.max("l_suppkey")).first()
    p_lo, p_hi = li.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    s_q = (s_lo + (s_hi - s_lo) // 4, s_lo + (s_hi - s_lo) * 2 // 4)
    p_q = (p_lo + (p_hi - p_lo) // 4, p_lo + (p_hi - p_lo) * 2 // 4)

    z_box, z_tot = _files_overlapping_box(zpath, *s_q, *p_q)
    s_box, s_tot = _files_overlapping_box(spath, *s_q, *p_q)
    assert z_tot == s_tot == n_files
    # two-column box: z-order prunes strictly harder than suppkey-sort
    assert z_box < s_box, (z_box, s_box)
    # partkey-only filter: z-order still prunes; single-sort reads all
    z_p, _ = _files_overlapping_box(zpath, s_lo, s_hi, *p_q)
    s_p, _ = _files_overlapping_box(spath, s_lo, s_hi, *p_q)
    assert s_p == n_files          # no partkey locality at all
    assert z_p < n_files           # bounded z-ranges bound BOTH dims
    # correctness: same rows either way
    assert spark.read.parquet(zpath).count() == li.count()


def test_shard_plan_partitions_corpus_next_fit(spark):
    """shard_plan assigns every row exactly once, preserves token
    totals, numbers shards contiguously from 0, and respects next-fit:
    a shard stops growing only once its running total crosses the
    budget, so no shard's total (minus its last doc) reaches it."""
    from spork_spark.operators import shard_plan
    from pyspark.sql import functions as F
    rows = [(i, (i * 37) % 90 + 10) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, n bigint")
    out = shard_plan(df, "doc_id", "n", tokens_per_shard=500, seed=3)
    assert out.count() == 400 and out.select("doc_id").distinct().count() == 400
    man = out.groupBy("shard_id").agg(F.sum("n").alias("tot"),
                                      F.max("n").alias("mx")).collect()
    sids = sorted(r.shard_id for r in man)
    assert sids == list(range(len(sids)))
    assert sum(r.tot for r in man) == sum(n for _, n in rows)
    for r in man:
        assert r.tot - r.mx < 500           # next-fit overshoot bound


def test_shard_plan_deterministic_and_seeded(spark):
    """Identical calls replay the identical assignment (resumable
    export); a different seed is a different permutation."""
    from spork_spark.operators import shard_plan
    rows = [(i, 20 + i % 13) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, n bigint")
    a = {r.doc_id: r.shard_id for r in
         shard_plan(df, "doc_id", "n", 300, seed=1).collect()}
    b = {r.doc_id: r.shard_id for r in
         shard_plan(df, "doc_id", "n", 300, seed=1).collect()}
    c = {r.doc_id: r.shard_id for r in
         shard_plan(df, "doc_id", "n", 300, seed=2).collect()}
    assert a == b
    assert a != c


def test_shard_plan_oversized_doc_isolated(spark):
    """A document at or above the budget occupies its prefix range
    alone — neighbors in shuffle order land in other shards."""
    from pyspark.sql import functions as F
    from spork_spark.operators import shard_plan
    rows = [(i, 10) for i in range(50)] + [(99, 5000)]
    df = spark.createDataFrame(rows, "doc_id bigint, n bigint")
    out = shard_plan(df, "doc_id", "n", tokens_per_shard=100, seed=5)
    big = out.where(F.col("doc_id") == 99).first().shard_id
    mates = out.where((F.col("shard_id") == big) &
                      (F.col("doc_id") != 99)).count()
    # next-fit: docs BEFORE the big one in its window may share the
    # shard it starts in, but nothing lands in the 50-shard range the
    # big doc's token mass spans after it
    spanned = out.where(F.col("shard_id").between(big + 1, big + 49)).count()
    assert spanned == 0
    assert mates * 10 < 100                 # at most the leading sliver


def test_shard_plan_incremental_appends_without_touching_history(spark):
    """The batch continues the shipped running total: the part-filled
    last shard tops up first, nothing lands below it, and the combined
    result equals shard_plan over the old-then-batch concatenated
    order (the documented contract — NOT a union re-plan)."""
    from pyspark.sql import functions as F
    from spork_spark.operators import shard_plan, shard_plan_incremental
    rows = [(i, 30 + i % 17) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id bigint, n bigint")
    old = df.where(F.col("doc_id") < 350)
    batch = df.where(F.col("doc_id") >= 350)
    oldplan = shard_plan(old, "doc_id", "n", 400, seed=11)
    manifest = oldplan.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("n_tokens"))
    inc = shard_plan_incremental(batch, manifest, "doc_id", "n", 400,
                                 seed=11)
    last = max(r.shard_id for r in manifest.collect())
    base = sum(r.n_tokens for r in manifest.collect())
    got = {r.doc_id: r.shard_id for r in inc.collect()}
    assert min(got.values()) >= last        # history immutable
    if base % 400:                          # part-filled → top up first
        assert min(got.values()) == last
    # reference: exclusive prefix over the batch in its md5 order + base
    order = sorted((r.doc_id for _, r in
                    enumerate(batch.collect())),
                   key=lambda i: (__import__("hashlib").md5(
                       f"11:{i}".encode()).hexdigest(), i))
    n_of = dict(rows)
    run = base
    for i in order:
        assert got[i] == run // 400
        run += n_of[i]


def test_shard_plan_incremental_empty_manifest_is_shard_plan(spark):
    """base = 0 on an empty manifest: the incremental path must equal
    plain shard_plan exactly."""
    from spork_spark.operators import shard_plan, shard_plan_incremental
    rows = [(i, 25 + i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, n bigint")
    empty = spark.createDataFrame([], "shard_id long, n_docs long, n_tokens long")
    a = {r.doc_id: r.shard_id for r in
         shard_plan(df, "doc_id", "n", 300, seed=2).collect()}
    b = {r.doc_id: r.shard_id for r in
         shard_plan_incremental(df, empty, "doc_id", "n", 300,
                                seed=2).collect()}
    assert a == b
