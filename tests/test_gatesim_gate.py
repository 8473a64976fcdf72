"""Gate: the committed driver-shape simulation artifact must be fresh.

tools/driver_gate_sim.py replays the DRIVER's canonicalization layer
(pandas sort over all columns + stringified value hash) per registry
query — the exact layer where the r8 reds (unhashable array cells) and
the r9-caught decimal hash-divergence lived, which the typed-Arrow
sweep is structurally blind to. Running it before each round's close
was a manual ritual; this gate makes it structural (the r9 verdict's
item 2): any edit to __spark_entry__.py without a fresh FULL-registry
replay fails the suite, exactly like tests/test_sweep_gate.py does for
the sf0.1 sweep.

Refresh with:
  python tools/driver_gate_sim.py /root/testdata/sf0.001 0 \
      --json docs/GATESIM_r<N>.json
(sf0.001: the harness-shape hazards are schema/type-level, so the
smallest fixture proves them at ~1/10 the sf0.01 runtime; value-level
correctness is the sweep's and the driver's job, not this artifact's.)
"""

import glob
import hashlib
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest():
    paths = glob.glob(os.path.join(REPO, "docs", "GATESIM_r*.json"))

    def rnum(p):
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    paths = [p for p in paths if rnum(p) >= 0]
    assert paths, "no docs/GATESIM_r*.json artifact committed"
    return max(paths, key=rnum)


def test_gatesim_is_fresh_green_and_full_registry():
    import __spark_entry__ as entrymod
    path = _latest()
    with open(path) as fh:
        sim = json.load(fh)
    assert sim["n_fail"] == 0, (
        f"{os.path.basename(path)} records driver-shape failures — fix "
        "and re-run the simulator")
    with open(os.path.join(REPO, "__spark_entry__.py"), "rb") as fh:
        current = hashlib.sha256(fh.read()).hexdigest()
    assert sim.get("registry_sha256") == current, (
        f"__spark_entry__.py changed since {os.path.basename(path)} — "
        "re-run: python tools/driver_gate_sim.py /root/testdata/sf0.001 "
        "0 --json docs/GATESIM_r<N>.json")
    assert sim["n_queries"] == len(entrymod.queries()), (
        "gate-sim ran against a different registry size — re-run it")
    simmed = set(sim["results"])
    assert simmed == set(entrymod.queries()), (
        f"gate-sim/registry name mismatch: only-in-registry="
        f"{sorted(set(entrymod.queries()) - simmed)[:5]} "
        f"only-in-sim={sorted(simmed - set(entrymod.queries()))[:5]}")
