"""Measure the DuckDB baseline (BASELINE.md protocol: warm, median of 5)
for the headline queries at an arbitrary scale dir. Handles both
single-file tables (driver fixtures) and directory tables (tools/
make_scale.py output).

Usage: python tools/duck_baseline.py [sf_dir]   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# single source of truth for the query set and the view setup (bench.py
# runs the same baseline inline, paired per-triple with the engine)
from bench import HEADLINE, duck_connect


def main() -> None:
    import __spark_entry__ as entrymod

    d = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duck_connect(d)

    # Results are consumed via .arrow(): full computation + vectorized
    # materialization, no per-row Python tuple conversion — the honest
    # analog of the Spark side's noop sink (fetchall() would charge DuckDB
    # for 6M-row Python object construction Spark never pays).
    oracle = entrymod.oracle_sql()
    results = {}
    for bench_name, qname in HEADLINE.items():
        sql = oracle[qname]
        con.sql(sql).arrow()             # warm (page cache, plans)
        con.sql(sql).arrow()
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            con.sql(sql).arrow()
            times.append(time.perf_counter() - t0)
        results[bench_name] = round(statistics.median(times), 4)

    sf = d.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "duckdb_baseline_median_total",
        "value": round(sum(results.values()), 4),
        "unit": "sec",
        "queries": results,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
