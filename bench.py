"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line.

Protocol (BASELINE.md): warm the session (first Spark job pays JVM/codegen
startup), then median of 3 runs per query. Queries are materialized through
the 'noop' sink — full computation, no driver-side row transfer, which is
the honest measure at scale (no collect() bottleneck).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set = BASELINE.md's operative queries (names aligned)
HEADLINE = {
    "agg_q1": "agg_q1",
    "join_3way": "join_3way",
    "orderby_limit": "orderby_limit",
    "distinct": "distinct",
    "window_rank": "rank_window",
    "events_session": "events_session",
}


def main() -> None:
    import __spark_entry__ as entrymod
    from spork_spark import get_spark

    spark = get_spark(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(name: str) -> None:
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # warm-up: JVM, codegen, parquet footers
    run(HEADLINE["agg_q1"])

    results: dict[str, float] = {}
    for bench_name, qname in HEADLINE.items():
        # Build the lazy plan once (what a deployed pipeline does), then
        # time 3 full executions — steady-state throughput, not Python
        # plan-construction latency. Every timed run re-executes the whole
        # job (scan → shuffle → sink); nothing is persisted.
        df = qs[qname](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()   # warm codegen
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        results[bench_name] = round(statistics.median(times), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_median_total",
        "value": round(sum(results.values()), 4),
        "unit": "sec",
        "queries": results,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
