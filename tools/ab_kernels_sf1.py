"""Kernel A/Bs for the two headline queries still running ~2x their
scan floors on JVM evaluation speed (round-7 item #7): window_rank
(1.79x floor) and events_session (1.91x floor). Plan shape is audited
optimal for both (single exchange, partial-agg fused), so these probe
ALTERNATIVE KERNELS for the same semantics:

  window_rank:
    R0  bench plan: rank() window over (custkey | price desc), filter
        rnk<=3, range-repartition mode.
    R1  array top-k: groupBy(custkey).collect_list -> array_sort ->
        threshold filter (keeps boundary ties exactly like rank()<=3)
        -> per-element rank by counting strictly-better prices ->
        explode. No window operator, no partition-wide sort — many
        tiny per-group sorts instead. (O(group^2) rank arithmetic:
        fine for bounded top-k groups, NOT a general rank substitute.)

  events_session:
    S0  bench plan: groupBy(user_id, hour) two-column hash agg.
    S1  packed-key agg: group on ONE long (user_id*32 + hour), unpack
        after the aggregate — probes whether two-column hashing is the
        kernel cost.

Parity asserted exactly (collected rows). Results appended to
docs/AB_KERNELS_SF1.json. Usage: python tools/ab_kernels_sf1.py [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 7
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
os.environ.setdefault("SPARK_GRAFT_SF_DIR", SF)


def main() -> None:
    import bench
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from spork_spark import get_spark

    spark = get_spark(master=f"local[{bench.CPUS}]",
                      extra_conf=bench.LATENCY_PROFILE)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def rank_arraytopk():
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        ag = (orders.select("o_custkey", "o_orderkey", "o_totalprice")
                    .groupBy("o_custkey")
                    .agg(F.array_sort(F.collect_list(F.struct(
                        (-F.col("o_totalprice")).alias("np"),
                        F.col("o_orderkey").alias("k"),
                        F.col("o_totalprice").alias("p")))).alias("a")))
        # rank()<=3 keeps boundary ties: threshold = 3rd element's price
        picked = (ag.withColumn(
            "thr", F.element_at("a", F.least(F.lit(3), F.size("a")))["np"])
            .select("o_custkey", F.expr(
                "transform(filter(a, x -> x.np <= thr), "
                " x -> struct(x.k as o_orderkey, x.p as o_totalprice, "
                "  1 + size(filter(a, y -> y.np < x.np)) as rnk))")
                .alias("top")))
        return (picked.select("o_custkey", F.explode("top").alias("t"))
                .select("o_custkey", F.col("t.o_orderkey"),
                        F.col("t.o_totalprice"),
                        F.col("t.rnk").cast("int").alias("rnk"))
                .orderBy("o_custkey", "rnk", "o_orderkey"))

    def session_packed():
        ev = spark.read.parquet(f"{SF}/events.parquet")
        packed = (ev.select((F.col("user_id") * 32
                             + F.hour("ts")).alias("k"), "value")
                    .groupBy("k")
                    .agg(F.count(F.lit(1)).alias("cnt"),
                         F.round(F.sum("value"), 2).alias("total")))
        return (packed.select(
                    (F.col("k") / 32).cast("long").alias("user_id"),
                    F.pmod("k", F.lit(32)).cast("int").alias("hr"),
                    "cnt", "total")
                .orderBy(F.desc("cnt"), "user_id", "hr").limit(50))

    pairs = {
        "rank_window": {"R0_bench": lambda: qs["rank_window"](spark, SF),
                        "R1_arraytopk": rank_arraytopk},
        "events_session": {"S0_bench": lambda: qs["events_session"](spark, SF),
                           "S1_packedkey": session_packed},
    }

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {"sf_dir": SF, "rounds": ROUNDS,
           "protocol": "strict interleave, warm, noop sink, "
                       f"local[{bench.CPUS}], bench LATENCY_PROFILE"}
    for qname, variants in pairs.items():
        rows = {n: sorted(map(tuple, mk().collect()))
                for n, mk in variants.items()}
        vals = list(rows.values())
        assert all(r == vals[0] for r in vals), \
            {n: r[:2] for n, r in rows.items()}
        for n, mk in variants.items():              # warm
            noop(mk())
        times = {n: [] for n in variants}
        for _ in range(ROUNDS):                     # strict interleave
            for n, mk in variants.items():
                df = mk()
                t0 = time.perf_counter()
                noop(df)
                times[n].append(time.perf_counter() - t0)
        for n in variants:
            out[f"{n}_median_sec"] = round(statistics.median(times[n]), 4)
            out[f"{n}_all"] = [round(t, 4) for t in times[n]]

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "AB_KERNELS_SF1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
