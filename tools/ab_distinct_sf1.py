"""distinct 2x-bar settlement A/B (round-10 item #4).

BENCH_SF1's distinct ratio_to_duckdb has straddled the 2x criterion
for four rounds — 1.6 (r6), 2.0 (r8), 2.04/2.53 (r9's two runs) —
with zero engine-side change on its path across those diffs. Two
stories: (a) the straddle is DuckDB/VM noise around a true ratio
near the bar; (b) a real regression crept in unmeasured.

Strict-interleave A/B on ONE boot, every sample adjacent:

  F0    bench floor: scan(l_orderkey, l_partkey) -> repartition(keys)
        -> noop (the widest exchange the plan shape must pay).
  Q     the engine's DISTINCT plan (queries()['distinct']).
  DUCK  the same oracle SQL in DuckDB, materialized via .arrow()
        (bench.py's pairing protocol).

>= 7 paired rounds; the artifact stamps per-pair ratios, the median,
and the min/max band. Verdict rule (pre-registered): if the paired
Q/DUCK band's MEDIAN is <= 2.1 the query is at-bar within noise and
the r6-r9 straddle was measurement spread; if the median sits above
2.1 with a band floor above 2.0, grade it weak and open a plan-level
investigation next round.

Writes docs/AB_DISTINCT_SF1.json.
Usage: python tools/ab_distinct_sf1.py [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 9
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

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    floor = li.select("l_orderkey", "l_partkey") \
              .repartition(F.col("l_orderkey"), F.col("l_partkey"))
    q = entrymod.queries()["distinct"](spark, SF)

    con = bench.duck_connect(SF)
    duck_sql = entrymod.oracle_sql()["distinct"]

    # parity before timing (row count: DISTINCT output is the contract)
    n_q = q.count()
    n_d = con.sql(f"SELECT count(*) FROM ({duck_sql})").fetchone()[0]
    assert n_q == n_d, f"row-count mismatch: engine {n_q} vs duck {n_d}"

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(df):
        t0 = time.perf_counter()
        run(df)
        return time.perf_counter() - t0

    def duck_timed():
        t0 = time.perf_counter()
        con.sql(duck_sql).arrow()
        return time.perf_counter() - t0

    for _ in range(3):  # warm all three
        run(floor); run(q); duck_timed()

    samples = {"F0_floor": [], "Q_engine": [], "DUCK": []}
    for _ in range(ROUNDS):  # strict interleave, one boot
        samples["F0_floor"].append(timed(floor))
        samples["Q_engine"].append(timed(q))
        samples["DUCK"].append(duck_timed())

    med = {k: round(statistics.median(v), 4) for k, v in samples.items()}
    pair_qd = [round(x / y, 3) for x, y in
               zip(samples["Q_engine"], samples["DUCK"])]
    pair_qf = [round(x / y, 3) for x, y in
               zip(samples["Q_engine"], samples["F0_floor"])]
    med_qd = statistics.median(pair_qd)
    verdict = ("at-bar within noise" if med_qd <= 2.1 else
               ("weak — regression investigation next round"
                if min(pair_qd) > 2.0 else
                "straddling — band crosses the bar, noise-dominated"))
    out = {
        "sf_dir": SF,
        "rounds": ROUNDS,
        "distinct_rows": n_q,
        "median_sec": med,
        "paired_Q_over_DUCK": pair_qd,
        "paired_Q_over_DUCK_median": round(med_qd, 2),
        "paired_Q_over_DUCK_band": [min(pair_qd), max(pair_qd)],
        "paired_Q_over_F0": pair_qf,
        "paired_Q_over_F0_median": round(statistics.median(pair_qf), 2),
        "verdict": verdict,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "AB_DISTINCT_SF1.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()


