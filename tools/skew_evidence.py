"""Skew-join evidence (round-6 item): measure the two skew remedies the
engine maps `JOIN ... USING 'skewed'` to, on an ACTUALLY skewed key at
sf1 scale, and record the artifact the claim has been missing.

Fixture: sf1 lineitem (6M rows) with a synthetic join key where ONE hot
key carries 20% of all rows (the reference's skewed-join motivating
case: pig:…/partitioners/SkewedPartitioner.java + PoissonSampleLoader
sampling — both replaced here by AQE's runtime skew splitting).
Right side: one row per distinct key (dim-shaped, too big to broadcast
after the threshold is forced off).

Measured, all in one session (same host-noise discipline as FLOOR.md):
1. plain shuffle join, AQE off — the hot key serializes one reducer.
2. AQE skew join — assert the FINAL adaptive plan actually split the
   hot partition (`skew=true` / CustomShuffleRead skewed), then time it.
3. salted_join (operators/skew.py) — deterministic pre-shuffle salting,
   parity-checked against the plain join's row count, then timed.

Writes SKEW_r06.json. Usage: python tools/skew_evidence.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"


def med(run, n=5):
    run(); run()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 4)


def main() -> None:
    from pyspark.sql import functions as F
    from spork_spark import get_spark
    from spork_spark.operators import salted_join

    spark = get_spark(master="local[32]", extra_conf={
        "spark.sql.shuffle.partitions": "32",
        # force the join to SHUFFLE (the skew remedies are moot for
        # broadcast joins — at 100 TB the dim side here wouldn't fit)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # AQE skew defaults target 256 MB partitions; size them to this
        # fixture so the splitter engages exactly as it would at scale
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            str(8 * 1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes":
            str(4 * 1024 * 1024),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.local.dir": "/dev/shm/spork-skew"
        if os.path.isdir("/dev/shm") else "/tmp/spork-skew",
    })
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    # hot key 0 gets ~20% of rows; the rest spread over l_orderkey
    left = li.select(
        F.when(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(5))
               == 0, F.lit(0)).otherwise(F.col("l_orderkey"))
        .alias("k"), F.col("l_extendedprice").alias("v"))
    right = (li.select(F.col("l_orderkey").alias("k")).distinct()
               .withColumn("w", F.col("k") * 2)
               .union(spark.createDataFrame([(0, 0)], "k long, w long")))
    # per-run scratch dir (mkdtemp, like soak_streaming.py): fixed
    # /tmp paths let concurrent or stale runs clobber each other's
    # fixtures and poison the measurement
    import atexit
    import shutil
    import tempfile
    scratch = tempfile.mkdtemp(prefix="spork-skew-fixture-")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    left.write.mode("overwrite").parquet(f"{scratch}/skew_left.parquet")
    right.write.mode("overwrite").parquet(f"{scratch}/skew_right.parquet")
    left = spark.read.parquet(f"{scratch}/skew_left.parquet")
    right = spark.read.parquet(f"{scratch}/skew_right.parquet")
    n_left = left.count()
    hot = left.where(F.col("k") == 0).count()

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    out = {"sf_dir": SF, "n_left": n_left, "hot_key_rows": hot,
           "hot_fraction": round(hot / n_left, 4),
           "protocol": "median of 5 warm runs, noop sink, local[32], "
                       "broadcast disabled (shuffle join forced)"}

    joined = left.join(right, on="k")
    expected = joined.count()
    out["join_rows"] = expected

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out["plain_shuffle_aqe_off_sec"] = med(lambda: sink(left.join(right, on="k")))

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    df = left.join(right, on="k")
    # Execute THIS QueryExecution (a noop write builds its own) so the
    # AdaptiveSparkPlanExec finalizes, then read the final plan — the
    # same collect-then-inspect pattern as Spark's AdaptiveQueryExecSuite;
    # .execute().count() runs it JVM-side without driver row transfer.
    df._jdf.queryExecution().executedPlan().execute().count()
    final = df._jdf.queryExecution().executedPlan().toString()
    out["aqe_final_plan_split_skew"] = (
        "skew=true" in final or "isSkew=true" in final)
    out["aqe_skew_join_sec"] = med(lambda: sink(left.join(right, on="k")))

    sj = salted_join(left, right, ["k"], ["k"], salt=32)
    out["salted_join_rows_match"] = (sj.count() == expected)
    out["salted_join_sec"] = med(lambda: sink(
        salted_join(left, right, ["k"], ["k"], salt=32)))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SKEW_r06.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    assert out["aqe_final_plan_split_skew"], "AQE did not split the hot partition"
    assert out["salted_join_rows_match"]


if __name__ == "__main__":
    main()
