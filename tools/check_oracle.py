"""Local stand-in for the driver's t2 correctness gate: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB at sf0.01,
compare row count, column names, order-insensitive values, AND result
types (Arrow-level), so the local gate is strictly stronger than the
driver's typed value-hash (r03 lesson: DuckDB SUM(INT) -> HUGEINT ->
decimal128(38,0) vs Spark bigint hashed differently despite equal
values).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def arrow_type_label(t):
    """Canonical label for a pyarrow DataType; widths preserved so
    int32-vs-int64 or decimal-vs-double divergence is caught."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{arrow_type_label(t.value_type)}>"
    if pa.types.is_map(t):
        return (f"map<{arrow_type_label(t.key_type)},"
                f"{arrow_type_label(t.item_type)}>")
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{arrow_type_label(f.type)}"
                         for f in t)
        return f"struct<{inner}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def spark_type_label(dt):
    """Canonical label for a pyspark DataType, matching arrow_type_label."""
    from pyspark.sql import types as T
    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return f"array<{spark_type_label(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return (f"map<{spark_type_label(dt.keyType)},"
                f"{spark_type_label(dt.valueType)}>")
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{spark_type_label(f.dataType)}"
                         for f in dt.fields)
        return f"struct<{inner}>"
    if isinstance(dt, T.NullType):
        return "null"
    return dt.simpleString()


def type_mismatches(spark_schema, arrow_schema):
    """Per-column-name canonical-type diffs between a Spark schema and a
    DuckDB Arrow schema. 'null' (all-NULL oracle column) matches anything."""
    s = {f.name: spark_type_label(f.dataType) for f in spark_schema.fields}
    d = {f.name: arrow_type_label(f.type) for f in arrow_schema}
    out = []
    for name in sorted(set(s) & set(d)):
        if s[name] != d[name] and "null" not in (s[name], d[name]):
            out.append(f"{name}: spark={s[name]} duck={d[name]}")
    return out


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
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check_oracle.py [sf_dir] [query ...] "
                     "[--json out.json]")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf = argv[0] if argv and "/" in argv[0] else "/root/testdata/sf0.01"
    only = [a for a in argv if "/" not in a]

    # Fingerprint the registry source BEFORE any query executes (a
    # sweep takes ~45 min at sf0.1; hashing at the end would stamp a
    # post-edit hash onto pre-edit results and let the staleness gate
    # pass on a stale sweep — round-8 advisor finding).
    import hashlib
    entry_path = os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py")
    with open(entry_path, "rb") as fh:
        registry_sha = hashlib.sha256(fh.read()).hexdigest()

    import __spark_entry__ as entrymod
    from spork_spark import get_spark
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        # directory tables (multi-file sf1 fixtures) need the glob form
        p = f"{sf}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    results = []
    for name, qfn in qs.items():
        if only and name not in only:
            continue
        try:
            df = qfn(spark, sf)
            spark_cols = df.columns
            spark_rows = df.collect()
        except Exception as exc:
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            results.append({"query": name, "status": "FAIL",
                            "detail": f"spark raised {exc}"[:300]})
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(spark_rows)} rows, no oracle)")
            results.append({"query": name, "status": "ROWS_ONLY",
                            "rows": len(spark_rows)})
            continue
        try:
            # ONE execution: the Arrow table supplies schema AND rows
            # (a separate fetchall would re-run the whole query — the
            # quadratic oracle replays make that expensive at sf0.1).
            tbl = con.sql(oracles[name]).arrow()
            duck_cols = list(tbl.schema.names)
            arrow_schema = tbl.schema
            cols_data = [tbl.column(i).to_pylist()
                         for i in range(tbl.num_columns)]
            duck_rows = list(zip(*cols_data)) if cols_data else []
        except Exception as exc:
            print(f"FAIL {name}: duckdb raised {exc}")
            results.append({"query": name, "status": "FAIL",
                            "detail": f"duckdb raised {exc}"[:300]})
            failures += 1
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rows {len(spark_rows)} vs {len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
        tdiff = type_mismatches(df.schema, arrow_schema)
        if tdiff:
            problems.append(f"types {tdiff}")
        if not problems:
            s, d = norm_rows(spark_rows, spark_cols), norm_rows(duck_rows, duck_cols)
            if s != d:
                diff = next((i, a, b) for i, (a, b) in enumerate(zip(s, d))
                            if a != b) if len(s) == len(d) else None
                problems.append(f"values differ; first diff: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            results.append({"query": name, "status": "FAIL",
                            "detail": '; '.join(problems)[:300]})
            failures += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            results.append({"query": name, "status": "PASS",
                            "rows": len(spark_rows)})
    print(f"\n{'ALL GREEN' if not failures else f'{failures} FAILURES'}")
    if json_out:
        import json
        # registry_sha was captured at startup (pre-sweep) so
        # tests/test_sweep_gate.py cannot be satisfied by a sweep whose
        # registry was edited mid-run.
        with open(json_out, 'w') as fh:
            json.dump({'sf': sf, 'n_queries': len(results),
                       'registry_sha256': registry_sha,
                       'n_pass': sum(r['status'] == 'PASS' for r in results),
                       'n_rows_only': sum(r['status'] == 'ROWS_ONLY' for r in results),
                       'n_fail': failures,
                       'protocol': 'single invocation, typed Arrow comparator '
                                   '(rows+cols+types+values, order-insensitive)',
                       'results': results}, fh, indent=1)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
