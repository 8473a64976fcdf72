"""Time every registry query through the noop sink (full computation of
every column, no driver-side row transfer — guide §1.4) at a given SF
dir under the bench's LATENCY_PROFILE. This is the optimization-round
measurement pass: per-query wall seconds at the scale the driver
benches, sorted slowest-first.

Usage:
    python tools/time_registry_noop.py /root/testdata/sf0.1 --json out.json \
        [--repeat 3] [--only name1,name2]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = None
    repeat = 3
    only = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    import bench
    import __spark_entry__ as m
    from spork_spark import get_spark
    spark = get_spark(master="local[32]",
                      extra_conf={**bench.LATENCY_PROFILE,
                                  "spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    rows = []
    for name, q in qs.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"time:{name}")
        try:
            t_build0 = time.monotonic()
            df = q(spark, sf)
            build = time.monotonic() - t_build0
            # warm once (codegen, file listing), then best-of-N timed runs:
            # min is the right statistic for a latency outlier hunt — noise
            # only adds time.
            df.write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(repeat):
                t0 = time.monotonic()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
            err = None
        except Exception as ex:  # noqa: BLE001 — record and continue
            build, best, err = -1.0, -1.0, f"{type(ex).__name__}: {ex}"[:200]
        rows.append({"query": name, "sec": round(best, 3),
                     "build_sec": round(build, 3), "err": err})
        print(f"{name:36s} exec={best:7.3f}s build={build:6.2f}s"
              + (f" ERR {err}" if err else ""), flush=True)
    rows.sort(key=lambda r: -r["sec"])
    doc = {"sf": sf, "protocol": "noop sink, warm, best-of-%d, local[32], "
           "bench LATENCY_PROFILE" % repeat, "results": rows}
    if out_path:
        json.dump(doc, open(out_path, "w"), indent=1)
    print("SLOWEST:", [(r["query"], r["sec"]) for r in rows[:15]])


if __name__ == "__main__":
    main()
