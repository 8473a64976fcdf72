"""Local stand-in for the driver's t2 correctness gate: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict) or type(v).__name__ == "Row":
        return tuple(sorted((k, norm_cell(x)) for k, x in
                            (v.items() if isinstance(v, dict)
                             else v.asDict().items())))
    return v


def norm_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    # key=repr: rows may mix None with ints/strings, which plain tuple
    # comparison rejects (the driver hashes values instead of sorting)
    return sorted((tuple(norm_cell(r[i]) for i in order) for r in rows),
                  key=repr)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] \
        else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    import __spark_entry__ as entrymod
    from spork_spark import get_spark
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, qfn in qs.items():
        if only and name not in only:
            continue
        try:
            df = qfn(spark, sf)
            spark_cols = df.columns
            spark_rows = df.collect()
        except Exception as exc:
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(spark_rows)} rows, no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb raised {exc}")
            failures += 1
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rows {len(spark_rows)} vs {len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
        if not problems:
            s, d = norm_rows(spark_rows, spark_cols), norm_rows(duck_rows, duck_cols)
            if s != d:
                diff = next((i, a, b) for i, (a, b) in enumerate(zip(s, d))
                            if a != b) if len(s) == len(d) else None
                problems.append(f"values differ; first diff: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
    print(f"\n{'ALL GREEN' if not failures else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
