"""Key-scalar generator fusion A/B (round-10 addendum).

`FOREACH (GROUP li BY k) GENERATE (chararray)group, COUNT(li)` used to
de-fuse the WHOLE FOREACH: one cast on the group key demoted the plan
from partial-agg fusion to collect_list materialization (every input
row shuffled as a struct). _is_key_scalar (compiler/plan.py) now keeps
such generators fused and evaluates the key expression post-agg.

Same-boot strict interleave; the unfused arm monkeypatches
_is_key_scalar to always-False (the pre-change classifier). Also
records the plan-shape facts, which matter more than small-SF timings:
at scale the unfused exchange carries the whole table.

Usage: python tools/ab_keyexpr_fusion.py [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 7
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    from spork_spark import Engine, get_spark
    from spork_spark.caching import release_cached
    from spork_spark.compiler.plan import PlanCompiler
    from spork_spark.parser import run_script

    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("FATAL")

    script = f"""
        li = LOAD '{SF}/lineitem.parquet';
        s = FOREACH (GROUP li BY l_partkey)
            GENERATE (chararray)group AS pk, COUNT(li) AS n,
                     SUM(li.l_quantity) AS q;
    """
    orig = PlanCompiler._is_key_scalar

    def build(fused: bool):
        PlanCompiler._is_key_scalar = \
            orig if fused else (lambda self, e, k: False)
        return run_script(Engine(spark), script)["s"].df()

    def timed(fused: bool) -> float:
        t0 = time.perf_counter()
        n = build(fused).count()
        dt = time.perf_counter() - t0
        release_cached(spark)
        return dt, n

    plans = {}
    for fused in (True, False):
        p = build(fused)._jdf.queryExecution().executedPlan().toString()
        plans["fused" if fused else "unfused"] = {
            "collect_list": "collect_list" in p,
            "partial_agg": "partial_count" in p,
        }
    timed(True); timed(False)                      # warm
    f_times, u_times = [], []
    for _ in range(ROUNDS):
        f, n1 = timed(True)
        u, n2 = timed(False)
        assert n1 == n2, "row-count parity"
        f_times.append(f)
        u_times.append(u)
    PlanCompiler._is_key_scalar = orig
    pairs = [round(u / f, 2) for f, u in zip(f_times, u_times)]
    out = {
        "sf_dir": SF,
        "rounds": ROUNDS,
        "rows": n1,
        "median_sec": {"fused": round(statistics.median(f_times), 4),
                       "unfused": round(statistics.median(u_times), 4)},
        "paired_unfused_over_fused": pairs,
        "paired_median": statistics.median(pairs),
        "plans": plans,
        "note": "unfused = pre-change classifier (cast-on-group de-fuses "
                "to collect_list of whole rows). The plan facts are the "
                "scale story: the unfused exchange carries every input "
                "row as a struct; the fused exchange carries one "
                "(key,count,sum) triple per map-side group.",
    }
    tag = "_SF1" if "sf1" in os.path.basename(SF.rstrip("/")) else ""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs",
        f"AB_KEYEXPR_FUSION{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
