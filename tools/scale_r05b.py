"""Round-5 NEW-operator scale slopes: warm medians at sf0.1 vs sf1
(tools/make_scale.py layout) for the operators added this round, merged
into SCALE_r05.json under "operators_r5" / "slopes_r5_10x_data_warm".

All of these are linear-shape designs (single keyed window / one
groupBy / broadcast stat joins / bounded-round graph loops), so the
expected slope for 10× data is ~≤10× — superlinearity here would mean
a design defect, which is exactly what this measurement guards.

Usage: python tools/scale_r05b.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = ["sessionize", "pagerank", "profile_events", "weighted_sample",
       "outliers", "winsorize_events", "rollup_incremental", "pmi",
       "chi2_lang_source", "histogram_events", "transitions",
       "dq_events", "cc_incremental", "sorted_neighborhood",
       "asof_nearest"]


def timed(fn, warm_runs=3):
    t0 = time.perf_counter()
    fn()
    cold = time.perf_counter() - t0
    ts = []
    for _ in range(warm_runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(cold, 4), round(statistics.median(ts), 4)


def main() -> None:
    import __spark_entry__ as entrymod
    from spork_spark import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dirs = {"sf0.1": "/root/testdata/sf0.1",
               "sf1": os.path.join(repo, "testdata_sf1")}
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out_path = os.path.join(repo, "SCALE_r05.json")
    with open(out_path) as fh:
        out = json.load(fh)
    out.setdefault("operators_r5", {})

    for sf, d in sf_dirs.items():
        ops = {}
        for name in OPS:
            # rebuild INSIDE the timed run: several operators execute
            # during construction (pagerank/cc localCheckpoint rounds,
            # sorted_neighborhood offset collect) — timing only a
            # pre-built frame's write would miss the algorithm
            cold, warm = timed(lambda n=name: noop(qs[n](spark, d)))
            ops[name] = {"cold_sec": cold, "warm_sec": warm,
                         "rows": qs[name](spark, d).count()}
            print(f"{sf} {name}: cold={cold} warm={warm} "
                  f"rows={ops[name]['rows']}", flush=True)
        out["operators_r5"][sf] = ops
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)

    slopes = {}
    for name in OPS:
        a = out["operators_r5"]["sf0.1"][name]["warm_sec"]
        b = out["operators_r5"]["sf1"][name]["warm_sec"]
        slopes[name] = round(b / a, 2) if a and b else None
    out["slopes_r5_10x_data_warm"] = slopes
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(slopes))


if __name__ == "__main__":
    main()
