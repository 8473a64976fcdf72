"""Interleaved same-session A/B for join_3way's remaining headroom
(FLOOR_r05.json: query 0.446 s vs scan+exchange floor 0.232 s).

Variants (all runtime-settable confs, so strictly interleaved A/B/C in
ONE session — no session-to-session drift):
  A  bench profile as-is: 1 MB broadcast threshold -> shuffle-hash
     joins with two-sided exchanges.
  B  16 MB threshold: orders (2.7 MB) + customer broadcast; lineitem
     never shuffles (probe fused into its single-task scan stage).
  C  B + AQE enabled (localShuffleReader / runtime re-plan on top).

Usage: python tools/ab_join3way.py [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 7


def main() -> None:
    import bench
    import __spark_entry__ as entrymod
    from spork_spark import get_spark

    spark = get_spark(master=f"local[{bench.CPUS}]",
                      extra_conf=bench.LATENCY_PROFILE)
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()["join_3way"]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    variants = {
        "A_shj_1mb": {"spark.sql.autoBroadcastJoinThreshold":
                      str(1024 * 1024),
                      "spark.sql.adaptive.enabled": "false"},
        "B_bcast_16mb": {"spark.sql.autoBroadcastJoinThreshold":
                         str(16 * 1024 * 1024),
                         "spark.sql.adaptive.enabled": "false"},
        "C_bcast_aqe": {"spark.sql.autoBroadcastJoinThreshold":
                        str(16 * 1024 * 1024),
                        "spark.sql.adaptive.enabled": "true"},
    }

    def run(conf):
        for k, v in conf.items():
            spark.conf.set(k, v)
        df = q(spark, bench.SF_DIR)
        t0 = time.perf_counter()
        noop(df)
        return time.perf_counter() - t0

    for name, conf in variants.items():     # warm each variant
        run(conf)
    times = {name: [] for name in variants}
    for _ in range(ROUNDS):                 # strict interleave
        for name, conf in variants.items():
            times[name].append(run(conf))
    for name in variants:
        med = statistics.median(times[name])
        print(f"{name}: median={med:.4f}s "
              f"all={[round(t, 4) for t in times[name]]}")

    # show the B plan so the exchange count is auditable
    for k, v in variants["B_bcast_16mb"].items():
        spark.conf.set(k, v)
    plan = q(spark, bench.SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    n_ex = plan.count("Exchange")
    n_b = plan.count("BroadcastHashJoin")
    print(f"B plan: {n_ex} Exchange, {n_b} BroadcastHashJoin")


if __name__ == "__main__":
    main()
