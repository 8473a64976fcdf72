"""Multi-query batching A/B (round-10 addendum).

Measures the optimization the r10 batch-store change enables: a script
whose expensive parent feeds three STOREs computes the parent ONCE
under batching (all store plans built before execution → the
>1-consumer persist fires) vs once PER STORE inline
(spark.spork.multiquery.enabled=false, the pre-r10 behavior and Pig's
-no_multiquery). This is the exact scenario Pig's MultiQueryOptimizer
exists for (SURVEY.md §4.2).

Strict interleave, one boot, N rounds of (on, off) pairs; caches
released and fresh output dirs per run so every round pays the full
computation. Writes docs/AB_MULTIQUERY.json.

Usage: python tools/ab_multiquery.py [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 7
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    from spork_spark import Engine, get_spark
    from spork_spark.caching import release_cached
    from spork_spark.parser import run_script

    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark)
    base = tempfile.mkdtemp(prefix="ab_multiquery_")

    # Two parent costs: cheap (one agg — persist overhead can cancel
    # the saved recompute at small scale) and expensive (join + agg —
    # the recompute clearly dominates). OFF is not the naive 3×: the
    # late persist upgrade (compiler/plan.py _compile reuse path)
    # kicks in at the SECOND consumer even inline, so OFF pays 2
    # parent computations vs ON's 1 + persist overhead.
    def cheap(out: str) -> str:
        return f"""
            li = LOAD '{SF}/lineitem.parquet';
            g = GROUP li BY l_partkey;
            s = FOREACH g GENERATE group AS pk,
                                   SUM(li.l_quantity) AS qty,
                                   COUNT_STAR(li) AS n;
            STORE s INTO '{out}/all';
            hot = FILTER s BY qty > 100.0;
            STORE hot INTO '{out}/hot';
            top = ORDER hot BY qty DESC, pk;
            t = LIMIT top 100;
            STORE t INTO '{out}/top';
        """

    def expensive(out: str) -> str:
        return f"""
            li = LOAD '{SF}/lineitem.parquet';
            o = LOAD '{SF}/orders.parquet';
            j = JOIN li BY l_orderkey, o BY o_orderkey;
            g = GROUP j BY (o_custkey, l_partkey);
            s = FOREACH g GENERATE FLATTEN(group) AS (ck, pk),
                                   SUM(j.l_quantity) AS qty,
                                   COUNT_STAR(j) AS n;
            STORE s INTO '{out}/all';
            hot = FILTER s BY qty > 40.0;
            STORE hot INTO '{out}/hot';
            top = ORDER hot BY qty DESC, ck, pk;
            t = LIMIT top 100;
            STORE t INTO '{out}/top';
        """

    def timed(script_fn, mode_on: bool, tag: str) -> float:
        spark.conf.set("spark.spork.multiquery.enabled",
                       "true" if mode_on else "false")
        out = os.path.join(base, tag)
        e = Engine(spark)            # fresh plan cache per run
        t0 = time.perf_counter()
        run_script(e, script_fn(out))
        dt = time.perf_counter() - t0
        release_cached(spark)
        shutil.rmtree(out, ignore_errors=True)
        return dt

    scenarios = {}
    for name, fn in (("cheap_parent_agg", cheap),
                     ("expensive_parent_join_agg", expensive)):
        timed(fn, True, "w_on"); timed(fn, False, "w_off")  # warm
        on, off = [], []
        for i in range(ROUNDS):      # strict interleave
            on.append(timed(fn, True, f"on_{i}"))
            off.append(timed(fn, False, f"off_{i}"))
        pairs = [round(o / b, 3) for b, o in zip(on, off)]
        scenarios[name] = {
            "median_sec": {"multiquery_on": round(statistics.median(on), 4),
                           "multiquery_off": round(statistics.median(off), 4)},
            "paired_off_over_on": pairs,
            "paired_off_over_on_median": round(statistics.median(pairs), 2),
        }

    out = {
        "sf_dir": SF,
        "rounds": ROUNDS,
        "scenarios": scenarios,
        "note": "off = inline stores (Pig -no_multiquery); on = batched "
                "stores + >1-consumer persist. OFF pays 2 parent "
                "computations (late upgrade catches the 2nd consumer), "
                "ON pays 1 + persist overhead — so the win scales with "
                "parent cost and can be a wash when the parent is a "
                "cheap agg.",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "AB_MULTIQUERY.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
