"""events_session floor-drift probe (round-9 item #5).

The paired floor protocol should make ratio_to_floor boot-invariant,
yet events_session measured 1.91x (r6 boot), 2.26x (sf0.1, r8 boot),
3.35x (sf1, r8 boot). Two possible stories:

  (a) the floor UNDER-MODELS the query: bench.floor_plans gives
      events_session scan-only (post-partial-agg exchange moves "few"
      rows), but at sf1 the group count is ~360k — the partial agg's
      hash table over 360k keys and the 360k-row exchange are real
      work the floor never pays, so the ratio's denominator is too
      small and scales wrong with sf;
  (b) there is recoverable headroom in the engine's plan.

Strict-interleave A/B on ONE boot, all variants in one session:

  F0   bench floor: scan(user_id, ts, value) -> noop (the current
       denominator).
  F1   agg-inclusive floor: scan -> groupBy(user_id, hour(ts)) ->
       count+sum -> noop. No ordering, no limit, no rounding — the
       cheapest plan ANY implementation of these semantics must pay.
  Q    the engine's fused plan (queries()['events_session']).
  A1   hand-built PySpark twin of Q (same agg, rounding, top-50) —
       isolates engine-translation overhead from kernel cost.
  A2   A1 with an explicit repartition(256, keys) before the agg
       (~1.4k groups per reduce task instead of ~11k at the profile's
       32 partitions) — probes reduce-side hash-table sizing.

If Q/F1 ~= 1, story (a) is proven: the fused plan is already the
aggregate's cost and the floor model simply omits the aggregate;
document and move on. If Q/F1 >> 1 and A1 or A2 beats Q, story (b):
take the faster plan. Parity asserted exactly (collected rows).

Writes docs/AB_EVENTS_SESSION_SF1.json.
Usage: python tools/ab_events_session.py [rounds] [sf_dir]
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

    ev = spark.read.parquet(f"{SF}/events.parquet")
    scan = ev.select("user_id", "ts", "value")

    def agg_floor():
        return (scan.select("user_id", F.hour("ts").alias("hr"), "value")
                    .groupBy("user_id", "hr")
                    .agg(F.count(F.lit(1)).alias("cnt"),
                         F.sum("value").alias("total")))

    def twin(repartition_n=None):
        base = scan.select("user_id", F.hour("ts").alias("hr"), "value")
        if repartition_n:
            base = base.repartition(repartition_n, "user_id", "hr")
        return (base.groupBy("user_id", "hr")
                    .agg(F.count(F.lit(1)).alias("cnt"),
                         (F.floor(F.sum("value") * 100.0 + 0.5) / 100.0)
                         .alias("total"))
                    .orderBy(F.col("cnt").desc(), "user_id", "hr")
                    .limit(50))

    variants = {
        "F0_scan_floor": scan,
        "F1_agg_floor": agg_floor(),
        "Q_engine": entrymod.queries()["events_session"](spark, SF),
        "A1_pyspark_twin": twin(),
        "A2_repartition256": twin(256),
    }

    # parity before timing
    q_rows = sorted(map(tuple, variants["Q_engine"].collect()))
    for v in ("A1_pyspark_twin", "A2_repartition256"):
        assert sorted(map(tuple, variants[v].collect())) == q_rows, v
    n_groups = agg_floor().count()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(df):
        t0 = time.perf_counter()
        run(df)
        return time.perf_counter() - t0

    for _ in range(3):  # warm all variants
        for df in variants.values():
            run(df)

    samples = {k: [] for k in variants}
    for _ in range(ROUNDS):  # strict interleave, one boot
        for k, df in variants.items():
            samples[k].append(timed(df))

    med = {k: round(statistics.median(v), 4) for k, v in samples.items()}
    paired = lambda a, b: round(statistics.median(
        [x / y for x, y in zip(samples[a], samples[b])]), 2)
    out = {
        "sf_dir": SF,
        "rounds": ROUNDS,
        "n_groups": n_groups,
        "median_sec": med,
        "paired_ratios": {
            "Q/F0_scan_floor": paired("Q_engine", "F0_scan_floor"),
            "Q/F1_agg_floor": paired("Q_engine", "F1_agg_floor"),
            "F1/F0": paired("F1_agg_floor", "F0_scan_floor"),
            "A1/Q": paired("A1_pyspark_twin", "Q_engine"),
            "A2/Q": paired("A2_repartition256", "Q_engine"),
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "AB_EVENTS_SESSION_SF1.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
