"""Round-6 scale evidence for the cardinality-fenced cumulative
operators (the r5 verdict's two `weak at 100x` items, fixed this round).

At sf1, abc_classes over l_orderkey has 1.5M distinct keys and
rfm_segments over events has user-cardinality frequency/monetary score
maps — both far above the 100k fence, so the RANGE-PARTITIONED two-pass
prefix sum (operators/_scalable.py) is what actually runs. This tool
measures BOTH paths on the SAME data (fence forced high = legacy global
window + broadcast map; fence default = scalable path) and records:

- byte-identical results (full typed parity, not row counts), and
- wall time of each path — the claim is not that two-pass is faster on
  one host (it pays an extra bounded collect + localCheckpoint); it is
  that it stays within a small constant of the single-task window while
  removing the one-task / one-broadcast scalability cliff.

Writes SCALE_r06.json. Usage: python tools/scale_r06.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
HIGH_FENCE = str(1 << 40)


def med(run, n=3):
    run()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 4)


def main() -> None:
    from pyspark.sql import functions as F
    from spork_spark import get_spark
    from spork_spark.operators import abc_classes, rfm_segments

    spark = get_spark(master="local[32]", extra_conf={
        "spark.sql.shuffle.partitions": "32",
    })
    spark.sparkContext.setLogLevel("ERROR")
    FENCE = "spark.spork.prefixSum.cardinalityFence"

    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))

    out = {"sf_dir": SF, "fence_default": 100_000,
           "protocol": "median of 3 warm runs, noop sink, local[32]; "
                       "parity = full typed row-set equality", "cases": {}}

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    def case(name, build, n_keys):
        spark.conf.set(FENCE, HIGH_FENCE)       # legacy single-window path
        legacy_rows = {tuple(r) for r in build().collect()}
        t_legacy = med(lambda: sink(build()))
        spark.conf.set(FENCE, "0")              # force the scalable path
        scal_rows = {tuple(r) for r in build().collect()}
        t_scal = med(lambda: sink(build()))
        spark.conf.unset(FENCE)
        out["cases"][name] = {
            "n_keys": n_keys,
            "above_fence": n_keys > 100_000,
            "parity": legacy_rows == scal_rows,
            "n_rows": len(scal_rows),
            "legacy_window_sec": t_legacy,
            "scalable_prefix_sum_sec": t_scal,
            "overhead_x": round(t_scal / t_legacy, 2),
        }
        print(name, out["cases"][name], flush=True)

    n_orders = li.select("l_orderkey").distinct().count()
    case("abc_orderkeys_sf1",
         lambda: abc_classes(li, "l_orderkey", "l_extendedprice"),
         n_orders)

    n_users = ev.select("user_id").distinct().count()
    case("rfm_events_sf1",
         lambda: rfm_segments(ev, user_col="user_id", ts_col="ts",
                              value_col="value"),
         n_users)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALE_r06.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    assert all(c["parity"] for c in out["cases"].values())
    print("ALL PARITY GREEN")


if __name__ == "__main__":
    main()
