"""Gate: the committed PLAN_AUDIT.json must be clean.

Round 5 shipped with 2 unadjudicated BroadcastNestedLoopJoin violations
(benign 1-row broadcasts that simply hadn't been whitelisted). This test
makes that structurally impossible: a non-empty `violations` or `errors`
array in the committed audit artifact fails the suite, so every cartesian
or Python row-path in the registry is either whitelisted with its fenced
justification in tools/plan_audit.py or blocks the commit.

(Plan-shape correctness itself is tested live in test_plans.py; this
gate checks the audit ARTIFACT so a red audit cannot ship unnoticed.)
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AUDIT = os.path.join(REPO, "PLAN_AUDIT.json")


def test_plan_audit_artifact_clean():
    assert os.path.exists(AUDIT), "PLAN_AUDIT.json missing — run tools/plan_audit.py"
    with open(AUDIT) as fh:
        report = json.load(fh)
    assert report["violations"] == [], (
        "PLAN_AUDIT.json has unadjudicated violations — whitelist with a "
        f"fenced justification or fix the plan: {report['violations']}")
    assert report["errors"] == [], report["errors"]


def test_plan_audit_covers_registry():
    """The audit must have been run against the full registry (stale
    artifacts from a smaller registry don't count as evidence)."""
    import __spark_entry__ as entrymod
    with open(AUDIT) as fh:
        report = json.load(fh)
    assert report["n_queries"] == len(entrymod.queries())
