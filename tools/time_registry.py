"""Time every registry query end-to-end (build + execute + collect to
Arrow) at a given SF dir. Finds per-query latency outliers the headline
bench doesn't cover. Usage:
    python tools/time_registry.py /root/testdata/sf0.01 --json out.json
"""
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    import __spark_entry__ as m
    from spork_spark import get_spark
    spark = get_spark(master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8",
                                  "spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    rows = []
    for name, q in qs.items():
        t0 = time.monotonic()
        try:
            df = q(spark, sf)
            n = df.count()
            err = None
        except Exception as ex:  # noqa: BLE001 — record and continue
            n, err = -1, f"{type(ex).__name__}: {ex}"[:200]
        dt = time.monotonic() - t0
        rows.append({"query": name, "sec": round(dt, 3), "rows": n,
                     "err": err})
        print(f"{name:32s} {dt:7.2f}s rows={n}", flush=True)
    rows.sort(key=lambda r: -r["sec"])
    doc = {"sf": sf, "results": rows}
    if out_path:
        json.dump(doc, open(out_path, "w"), indent=1)
    print("SLOWEST:", [(r["query"], r["sec"]) for r in rows[:12]])


if __name__ == "__main__":
    main()
