"""join_3way headroom A/B at sf1 (round-7 item #1).

FLOOR_sf1.json: the query runs 0.598 s against a 0.284 s scan+exchange
floor — the one headline query with >2x its own floor AND a plan lever
left. Variants, strictly interleaved in ONE session (runtime confs +
pre-created tables, so no session drift):

  A_bench      bench profile as-is (16 MB broadcast, AQE on): customer
               and nation broadcast; orders<->lineitem is the only big
               shuffle, joined by sort-merge.
  B_shj        A + preferSortMergeJoin=false: the orders<->lineitem
               shuffle feeds a ShuffledHashJoin — same exchanges, no
               sort of 6M lineitem rows (build side = orders).
  C_bucket_smj orders+lineitem pre-bucketed (32 buckets on the join
               key, sorted, one file per bucket — the ETL-time CTAS a
               deployment would do for its hottest join): exchange-free
               AND sort-free merge join. CTAS cost reported separately.
  D_bucket_shj C with preferSortMergeJoin=false (bucketing satisfies
               the hash-clustered requirement for SHJ too).

All variants produce the same aggregate; parity is asserted on the
collected rows. Writes docs/AB_JOIN3WAY_SF1.json.

Usage: python tools/ab_join3way_sf1.py [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 7
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
os.environ.setdefault("SPARK_GRAFT_SF_DIR", SF)

N_BUCKETS = 32


def main() -> None:
    import bench
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from spork_spark import get_spark

    spark = get_spark(master=f"local[{bench.CPUS}]",
                      extra_conf=bench.LATENCY_PROFILE)
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()["join_3way"]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # --- one-time CTAS: bucketed+sorted orders/lineitem ------------
    # repartition(32, key) uses the same pmod(murmur3, n) as the bucket
    # id, so each write task holds exactly one bucket -> ONE file per
    # bucket -> the sorted-bucket read needs no sort and no exchange.
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh = wh.removeprefix("file:")
    for t in ("ab_orders_b", "ab_lineitem_b"):   # stale prior runs
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    t0 = time.perf_counter()
    (spark.read.parquet(f"{SF}/orders.parquet")
        .repartition(N_BUCKETS, F.col("o_orderkey"))
        .write.mode("overwrite").bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("ab_orders_b"))
    (spark.read.parquet(f"{SF}/lineitem.parquet")
        .repartition(N_BUCKETS, F.col("l_orderkey"))
        .write.mode("overwrite").bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("ab_lineitem_b"))
    ctas_sec = round(time.perf_counter() - t0, 4)

    def bucketed_query(hint):
        # the hint pins the orders<->lineitem strategy: without it AQE
        # broadcasts the 26 MB orders table off the catalog stats — the
        # exact plan round 6 measured WORSE (1.5M-row hash build)
        cust = spark.read.parquet(f"{SF}/customer.parquet")
        nation = spark.read.parquet(f"{SF}/nation.parquet")
        orders = spark.table("ab_orders_b").hint(hint)
        li = spark.table("ab_lineitem_b")
        j = (orders.join(li, orders.o_orderkey == li.l_orderkey)
                   .join(F.broadcast(cust),
                         F.col("o_custkey") == F.col("c_custkey"))
                   .join(F.broadcast(nation),
                         F.col("c_nationkey") == F.col("n_nationkey")))
        return (j.groupBy("n_name")
                 .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
                      F.count(F.lit(1)).alias("n_items"))
                 .orderBy("n_name"))

    variants = {
        # bench profile already sets preferSortMergeJoin=false, so the
        # as-is baseline IS the shuffled-hash plan; B documents the
        # sort-merge alternative on the same exchanges.
        "A_bench_shj": (lambda: q(spark, SF),
                        {"spark.sql.join.preferSortMergeJoin": "false"}),
        "B_smj": (lambda: q(spark, SF),
                  {"spark.sql.join.preferSortMergeJoin": "true"}),
        "C_bucket_smj": (lambda: bucketed_query("merge"),
                         {"spark.sql.join.preferSortMergeJoin": "true"}),
        "D_bucket_shj": (lambda: bucketed_query("shuffle_hash"),
                         {"spark.sql.join.preferSortMergeJoin": "false"}),
        "E_bucket_aqe_bcast": (lambda: bucketed_query("broadcast"),
                               {"spark.sql.join.preferSortMergeJoin":
                                "false"}),
    }

    # parity across variants
    rows = {}
    for name, (mk, conf) in variants.items():
        for k, v in conf.items():
            spark.conf.set(k, v)
        rows[name] = sorted(map(tuple, mk().collect()))
    base = rows["A_bench_shj"]
    assert all(r == base for r in rows.values()), \
        {k: v[:2] for k, v in rows.items()}

    def run(mk, conf):
        for k, v in conf.items():
            spark.conf.set(k, v)
        df = mk()
        t0 = time.perf_counter()
        noop(df)
        return time.perf_counter() - t0

    for name, (mk, conf) in variants.items():       # warm
        run(mk, conf)
    times = {n: [] for n in variants}
    for _ in range(ROUNDS):                          # strict interleave
        for name, (mk, conf) in variants.items():
            times[name].append(run(mk, conf))

    out = {"sf_dir": SF, "rounds": ROUNDS, "n_buckets": N_BUCKETS,
           "ctas_sec": ctas_sec, "parity": "exact (collected rows equal)",
           "protocol": "strict interleave, warm, noop sink, "
                       f"local[{bench.CPUS}], bench LATENCY_PROFILE"}
    for name in variants:
        out[name + "_median_sec"] = round(statistics.median(times[name]), 4)
        out[name + "_all"] = [round(t, 4) for t in times[name]]

    # auditable plans: exchange / sort / join-node counts per variant
    for name, (mk, conf) in variants.items():
        for k, v in conf.items():
            spark.conf.set(k, v)
        plan = mk()._jdf.queryExecution().executedPlan().toString()
        out[name + "_plan"] = {
            "Exchange": plan.count("Exchange"),
            "Sort": plan.count("+- Sort") + plan.count(":- Sort"),
            "SortMergeJoin": plan.count("SortMergeJoin"),
            "ShuffledHashJoin": plan.count("ShuffledHashJoin"),
            "BroadcastHashJoin": plan.count("BroadcastHashJoin"),
        }

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "AB_JOIN3WAY_SF1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))

    for t in ("ab_orders_b", "ab_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)


if __name__ == "__main__":
    main()
