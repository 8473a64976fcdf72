"""Per-query performance FLOOR decomposition (round-5 item 1).

For each headline query, measure — under EXACTLY the bench session
profile (bench.py LATENCY_PROFILE) — the irreducible Spark costs that
bound it from below:

- ``scan``: scan of exactly the columns the query reads (same pushed
  filters), materialized through the noop sink. No plan can beat this:
  every query must read its input columns.
- ``scan_exchange``: the same scan plus ONE hash exchange of the rows
  the query's plan must move across its widest shuffle boundary
  (distinct/window/orderby move the full projected row set; agg_q1
  moves only 6 post-partial-agg rows, so its exchange adds ~nothing).
  This is the floor for any single-shuffle plan shape.
- ``noop``: an empty-DataFrame write through the noop sink — the fixed
  per-job cost (job submission, DAG scheduling, stage bookkeeping) that
  every Spark action pays regardless of data.

Output: FLOOR_r05.json — per query: floor components, the measured
query time (same protocol as bench.py: median of 7 warm runs), the
DuckDB baseline, and the derived ``headroom`` (query − scan_exchange):
what plan improvements could still recover, vs the ``floor_vs_duckdb``
gap that no plan change can close (it is the price of the
executor-count-invariant execution model — exchange serialization +
per-job overhead; see BASELINE.md's own protocol caveat).

Usage: python tools/floor_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def median_time(run, n=7):
    run()                      # re-warm directly before timing
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 4)


def main() -> None:
    import bench
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from spork_spark import get_spark

    spark = get_spark(master=f"local[{CPUS}]",
                      extra_conf=bench.LATENCY_PROFILE)
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # per-query floor plans: (base_df, exchange_keys_or_None) — the
    # single source of truth lives in bench.floor_plans (bench.py also
    # stamps these floors into its own JSON line each round). Note:
    # events_session's base is its bare AGGREGATE, not a scan (the agg
    # is the dominant unavoidable cost — AB_EVENTS_SESSION_SF1), so its
    # scan_sec field below reads as "agg floor".
    floors = bench.floor_plans(spark, SF_DIR)

    qs = entrymod.queries()
    q_dfs = {n: qs[bench.HEADLINE[n]](spark, SF_DIR) for n in floors}

    # warm everything (JVM/JIT/codegen/footers/page cache) — 3 passes,
    # same as bench.py
    empty = spark.range(0).select(F.lit(1).alias("x"))
    for _ in range(3):
        noop(empty)
        for scan, keys in floors.values():
            noop(scan)
            if keys:
                noop(scan.repartition(*[F.col(k) for k in keys]))
        for df in q_dfs.values():
            noop(df)

    fixed = median_time(lambda: noop(empty))

    if len(sys.argv) > 2:
        # measured baseline for THIS sf_dir: a tools/duck_baseline.py
        # output JSON ({"queries": {name: sec}}) — required for any
        # dir other than sf0.1, where the hardcoded numbers are wrong
        with open(sys.argv[2]) as fh:
            baseline = json.load(fh)["queries"]
    else:
        baseline = {      # BASELINE.md measured DuckDB medians (sf0.1)
            "agg_q1": 0.0659, "join_3way": 0.0708,
            "orderby_limit": 0.0623, "distinct": 0.0500,
            "window_rank": 0.0446, "events_session": 0.0311,
        }

    out = {"sf_dir": SF_DIR, "fixed_job_overhead_sec": fixed,
           "protocol": "median of 7 warm runs through noop sink, "
                       "bench.py LATENCY_PROFILE session", "queries": {}}
    for name, (scan, keys) in floors.items():
        scan_t = median_time(lambda s=scan: noop(s))
        if keys:
            ex = scan.repartition(*[F.col(k) for k in keys])
            ex_t = median_time(lambda e=ex: noop(e))
        else:
            ex_t = scan_t
        q_t = median_time(lambda d=q_dfs[name]: noop(d))
        b = baseline.get(name)
        out["queries"][name] = {
            "scan_sec": scan_t,
            "scan_exchange_sec": ex_t,
            "query_sec": q_t,
            "duckdb_sec": b,
            "headroom_sec": round(q_t - ex_t, 4),
            "floor_vs_duckdb": round(ex_t / b, 2) if b else None,
            # the honest bound: even a plan that did ZERO work beyond
            # its scan+exchange floor still pays the fixed per-job cost
            "floor_plus_overhead_vs_duckdb":
                round((ex_t + fixed) / b, 2) if b else None,
            "query_vs_duckdb": round(q_t / b, 2) if b else None,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
