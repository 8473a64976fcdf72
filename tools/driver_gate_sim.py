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

Usage: python tools/driver_gate_sim.py [sf_dir] [n_keys]   # default sf0.01, 50
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

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
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
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
