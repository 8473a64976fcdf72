"""Gate: the committed full-registry sweep artifact must be fresh.

The driver's 50-query correctness gate has sampled the same 50 queries
since round 1; the other ~160 registry queries rest on the committed
single-invocation sweep (docs/SWEEP_r*.json, tools/check_oracle.py
--json). That evidence is only worth anything if it cannot silently go
stale: this test fails the suite when the registry
(__spark_entry__.py) changes without a re-sweep, the same pattern
test_plan_audit_gate.py applies to PLAN_AUDIT.json.

Freshness is pinned by a sha256 of __spark_entry__.py stamped into the
artifact at sweep time ('registry_sha256'). Hashing the whole file
(rather than just the query names) is deliberate: the sweep certifies
the query BODIES and oracle SQL strings, so any edit to them must
invalidate it. Implementation edits inside spork_spark/ are covered by
the live pytest suite + the driver gate, not this artifact hash — a
full sf0.1 sweep per docstring tweak would be gate theater.

The sf1 sweep artifact (docs/SWEEP_sf1_r*.json) is a curated SUBSET
(quadratic pair baselines excluded by construction), refreshed when
scale-relevant code moves; it is checked for cleanliness, not for the
registry hash.
"""

import glob
import hashlib
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest(pattern):
    paths = glob.glob(os.path.join(REPO, "docs", pattern))
    # sort by round number, not lexically (r9 < r10 must hold)
    def rnum(p):
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    paths = [p for p in paths if rnum(p) >= 0]
    assert paths, f"no docs/{pattern} artifact committed"
    return max(paths, key=rnum)


def test_full_sweep_is_fresh_and_green():
    sweep_path = _latest("SWEEP_r*.json")
    with open(sweep_path) as fh:
        sweep = json.load(fh)
    assert sweep["n_fail"] == 0, (
        f"{os.path.basename(sweep_path)} records failures — fix and re-sweep")
    with open(os.path.join(REPO, "__spark_entry__.py"), "rb") as fh:
        current = hashlib.sha256(fh.read()).hexdigest()
    assert sweep.get("registry_sha256") == current, (
        f"__spark_entry__.py changed since {os.path.basename(sweep_path)} "
        "was produced — re-run: python tools/check_oracle.py "
        "/root/testdata/sf0.1 --json docs/SWEEP_r<N>.json")


def test_full_sweep_covers_registry():
    import __spark_entry__ as entrymod
    sweep_path = _latest("SWEEP_r*.json")
    with open(sweep_path) as fh:
        sweep = json.load(fh)
    assert sweep["n_queries"] == len(entrymod.queries()), (
        "sweep ran against a different registry size — re-sweep")
    swept = {r["query"] for r in sweep["results"]}
    assert swept == set(entrymod.queries()), (
        f"sweep/registry name mismatch: only-in-registry="
        f"{sorted(set(entrymod.queries()) - swept)[:5]} "
        f"only-in-sweep={sorted(swept - set(entrymod.queries()))[:5]}")


def test_sf1_sweep_artifact_clean():
    with open(_latest("SWEEP_sf1_r*.json")) as fh:
        sweep = json.load(fh)
    assert sweep["n_fail"] == 0
    # subset by construction, but it must stay a substantial one
    assert sweep["n_queries"] >= 150
