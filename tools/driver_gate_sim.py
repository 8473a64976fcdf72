"""Pre-flight simulation of the driver's correctness gate.

The driver runs each of the FIRST 50 `queries()` keys and its
`oracle_sql()` twin at sf0.01, then canonicalizes each result as a
pandas frame — sorted over ALL columns — before hashing values. That
sort is the exact operation that red-ed r8's three array-output
queries with `TypeError: unhashable type: 'list'` even though the
values were correct, which the typed-Arrow local sweep (strictly
stronger on types, weaker on harness shape) could never see.

This tool replays that harness shape locally: pandas canonicalization,
row count, sorted column names, and a value hash on stringified cells
(NaN/None normalized the way pandas string-casting does). It is run
before each round's close over the first-50 rotation so a harness-
shape regression cannot reach the driver unseen.

Usage: python tools/driver_gate_sim.py [sf_dir] [n_keys] [--json out.json]
       # default sf0.01, 50; n_keys 0 = full registry

With --json the result is stamped into an artifact keyed by the
sha256 of __spark_entry__.py (the SWEEP_r*.json pattern):
tests/test_gatesim_gate.py fails the suite when the registry changes
without a fresh full-registry replay, so a harness-shape hazard can
never reach the driver behind a stale artifact.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import duck_connect


def canon_hash(pdf):
    """The driver-shaped canonicalization: column-name sort, then a
    row sort over all columns, then hash stringified values. Raises on
    unhashable cells exactly like the driver's sort does."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return hashlib.md5(
        pdf.astype(str).to_csv(index=False).encode()).hexdigest()


def main() -> None:
    import __spark_entry__ as entrymod
    from spork_spark import get_spark

    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    n = int(argv[1]) if len(argv) > 1 else 50

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if n <= 0:
        n = len(qs)
    report, n_fail = {}, 0
    for name in list(qs)[:n]:
        entry = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "err": None}
        try:
            sdf = qs[name](spark, sf).toPandas()
            if name not in oracles:
                entry.update(rows_match=True, note="rows-only (no oracle)",
                             spark_rows=len(sdf))
                report[name] = entry
                print(f"ROWS-ONLY {name} ({len(sdf)} rows)")
                continue
            odf = con.sql(oracles[name]).df()
            entry["spark_rows"], entry["oracle_rows"] = len(sdf), len(odf)
            entry["rows_match"] = len(sdf) == len(odf)
            entry["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
            entry["hash_match"] = canon_hash(sdf) == canon_hash(odf)
        except Exception as exc:
            entry["err"] = f"{type(exc).__name__}: {exc}"
        report[name] = entry
        ok = entry["rows_match"] and entry["schema_match"] \
            and entry["hash_match"] and not entry["err"]
        if not ok:
            n_fail += 1
        print(("PASS" if ok else "FAIL"), name,
              "" if ok else json.dumps(entry))
    print(f"\n{n - n_fail}/{n} driver-shape green")
    if json_out:
        entry_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__spark_entry__.py")
        with open(entry_path, "rb") as fh:
            sha = hashlib.sha256(fh.read()).hexdigest()
        with open(json_out, "w") as fh:
            json.dump({"registry_sha256": sha, "sf_dir": sf,
                       "n_queries": n, "n_fail": n_fail,
                       "results": report}, fh, indent=1)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
