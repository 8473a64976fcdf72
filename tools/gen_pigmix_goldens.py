"""Generate + verify DuckDB-derived golden TSVs INDEPENDENTLY
(the PigMix L1-L17 ports plus other scripted-surface goldens).

The golden harness (tests/test_golden_scripts.py) pins engine output
against checked-in TSVs; this tool derives those TSVs for the PigMix
ports from DuckDB SQL replays (the same independence rule as the
oracle_sql() registry), and refuses to write a golden unless the
engine output and the DuckDB replay agree cell-for-cell under the
harness's own formatting. Reference analog: the PigMix suite itself
(`pig:test/perf/pigmix/`), whose shapes docs/PIGMIX.md maps; these
scripts are those shapes run through the parser at sf0.001.

Usage: python tools/gen_pigmix_goldens.py [sf_dir]
       python tools/gen_pigmix_goldens.py --check [sf_dir] [--json out]
           compare-only at an arbitrary scale (no goldens written) —
           script-level parity at the scale the goldens don't pin,
           the reference e2e's full-data diff model
           (pig:test/e2e/pig/drivers/TestDriverPig.pm).
"""

from __future__ import annotations

import os
import pathlib
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARGS = sys.argv[1:]
CHECK = "--check" in ARGS
if CHECK:
    ARGS.remove("--check")
JSON_OUT = None
if "--json" in ARGS:
    i = ARGS.index("--json")
    JSON_OUT = ARGS[i + 1]
    ARGS = ARGS[:i] + ARGS[i + 2:]
SF = ARGS[0] if ARGS else "/root/testdata/sf0.001"
GOLDEN = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"

# Pig ROUND is floor(x + 0.5) returning a long — replayed literally.
R = "CAST(FLOOR({} + 0.5) AS BIGINT)"

ORACLES: dict[str, str] = {
    "pigmix_l01": f"""
        WITH b AS (
          SELECT user_id, event_type, value,
                 unnest([value, value + 1.0]) AS page_links
          FROM events),
        c AS (SELECT user_id,
                     CASE WHEN event_type = 'click' THEN value
                          ELSE page_links END AS header
              FROM b)
        SELECT user_id AS uid, COUNT(*) AS cnt,
               {R.format('SUM(header) * 100.0')} AS header_cents
        FROM c GROUP BY 1 ORDER BY 1
    """,
    "pigmix_l02": f"""
        SELECT e.user_id AS uid, c.c_mktsegment AS seg, COUNT(*) AS n,
               {R.format('SUM(e.value) * 100.0')} AS cents
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2 ORDER BY 1
    """,
    "pigmix_l03": f"""
        SELECT o.o_orderpriority AS prio, COUNT(*) AS n,
               {R.format('SUM(l.l_extendedprice) * 100.0')} AS cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1 ORDER BY 1
    """,
    "pigmix_l04": """
        SELECT user_id AS uid, COUNT(DISTINCT event_type) AS n_actions
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "pigmix_l05": """
        SELECT c_custkey AS cust FROM customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0)
        ORDER BY 1
    """,
    "pigmix_l06": """
        WITH b AS (
          SELECT CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END AS big_qty,
                 l_orderkey % 10 AS okmod,
                 CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS price_r
          FROM lineitem)
        SELECT big_qty, okmod, COUNT(*) AS n,
               CAST(SUM(price_r) AS BIGINT) AS tot
        FROM b GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "pigmix_l07": """
        SELECT user_id AS uid,
               COUNT(*) FILTER (value < 150.0) AS n_am,
               COUNT(*) FILTER (value >= 150.0) AS n_pm
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "pigmix_l08": f"""
        SELECT COUNT(*) AS n,
               {R.format('SUM(l_quantity)')} AS qty,
               CAST(SUM({R.format('l_extendedprice * 100.0')}) AS BIGINT)
                   AS cents
        FROM lineitem
    """,
    "pigmix_l09": """
        SELECT event_id, event_type, value FROM events
        ORDER BY event_type, event_id
    """,
    "pigmix_l10": """
        SELECT o_orderpriority, o_totalprice, o_orderkey FROM orders
        ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey
    """,
    "pigmix_l11": """
        SELECT DISTINCT k FROM (
          SELECT user_id AS k FROM events
          UNION ALL SELECT o_custkey % 20 FROM orders)
        ORDER BY k
    """,
    "pigmix_l12": """
        WITH s AS (SELECT o_orderpriority AS prio,
                          CASE WHEN o_totalprice >= 200000.0
                               THEN 'hi' ELSE 'lo' END AS side
                   FROM orders)
        SELECT prio, side, COUNT(*) AS n
        FROM s GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "pigmix_l13": """
        SELECT c.c_custkey AS cust,
               CAST(SUM(CASE WHEN b.o_orderkey IS NULL THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_big
        FROM customer c
        LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 250000.0) b
               ON c.c_custkey = b.o_custkey
        GROUP BY 1 ORDER BY 1
    """,
    "pigmix_l14": f"""
        SELECT c.c_mktsegment AS seg, COUNT(*) AS n,
               {R.format('SUM(o.o_totalprice) * 100.0')} AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1 ORDER BY 1
    """,
    "pigmix_l15": """
        SELECT o_orderpriority AS prio,
               COUNT(DISTINCT o_custkey) AS n_cust,
               COUNT(DISTINCT o_orderstatus) AS n_status
        FROM orders GROUP BY 1 ORDER BY 1
    """,
    "pigmix_l16": f"""
        WITH r AS (
          SELECT o_custkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey)
                     AS rn
          FROM orders)
        SELECT o_custkey AS cust,
               {R.format('SUM(o_totalprice) * 100.0')} AS top3_cents
        FROM r WHERE rn <= 3 GROUP BY 1 ORDER BY 1
    """,
    "pigmix_l17": f"""
        SELECT l_returnflag AS rf, l_linestatus AS ls,
               CAST(l_shipdate AS VARCHAR) AS sd, l_linenumber AS ln,
               COUNT(*) AS n, {R.format('SUM(l_quantity)')} AS qty
        FROM lineitem
        GROUP BY 1, 2, 3, 4 HAVING COUNT(*) > 1
        ORDER BY 1, 2, 3, 4
    """,
    # --- non-PigMix scripted-surface goldens (same independence rule) ---
    "join_skewed_agg": f"""
        SELECT o.o_orderstatus AS status, COUNT(*) AS n,
               {R.format('SUM(l.l_extendedprice) * 100.0')} AS cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1 ORDER BY 1
    """,
    "join_merge_sparse_agg": """
        SELECT c.c_custkey AS cust, b.o_orderkey AS ok
        FROM customer c
        JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) b
          ON c.c_custkey = b.o_custkey
        ORDER BY 1, 2
    """,
    "rank_variants": """
        SELECT kind, rnk, o_orderkey FROM (
          SELECT 'rank' AS kind,
                 RANK() OVER (ORDER BY o_orderpriority) AS rnk,
                 o_orderkey
          FROM orders
          UNION ALL
          SELECT 'dense',
                 DENSE_RANK() OVER (ORDER BY o_orderpriority),
                 o_orderkey
          FROM orders)
        ORDER BY kind, o_orderkey
    """,
    "datetime_mix": """
        SELECT o_orderkey,
               year(o_orderdate) AS yr, month(o_orderdate) AS mo,
               weekofyear(o_orderdate) AS wk,
               strftime(o_orderdate, '%Y-%m-%d') AS ds,
               date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days
        FROM orders
        WHERE year(o_orderdate) = 1997
        ORDER BY o_orderkey
    """,
    "cast_edges": """
        SELECT n_nationkey,
               CAST(TRUNC(CAST(n_nationkey - 30 AS DOUBLE) / 7) AS INT)
                   AS intdiv,
               CAST(NULL AS INT) AS divzero,
               CAST(NULL AS INT) AS badcast,
               regexp_full_match(n_name, 'NATION_1.') AS m1
        FROM nation ORDER BY n_nationkey
    """,
}

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _fmt_cell(v):
    # mirror of tests/test_golden_scripts._fmt_cell (the comparison is
    # only meaningful under the harness's own formatting)
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.4f}"
    return str(v)


def main() -> None:
    from spork_spark import Engine, get_spark
    from spork_spark.parser import run_script

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark)

    n_bad, report = 0, []
    for stem, sql in ORACLES.items():
        script = GOLDEN / f"{stem}.pig"
        rels = run_script(eng, script.read_text(), params={"sf": SF})
        df = rels["out"].df()
        cols = df.columns
        got = [[_fmt_cell(v) for v in row] for row in df.collect()]
        want = [[_fmt_cell(v) for v in row] for row in con.sql(sql).fetchall()]
        if got != want:
            n_bad += 1
            report.append({"script": stem, "status": "FAIL",
                           "rows": len(got), "oracle_rows": len(want)})
            print(f"MISMATCH {stem}: engine {len(got)} rows, duck {len(want)}")
            for g, w in list(zip(got, want))[:5]:
                if g != w:
                    print(f"  engine={g}\n  duck  ={w}")
            continue
        report.append({"script": stem, "status": "PASS", "rows": len(got)})
        if not CHECK:
            assert len(got) > 0, f"{stem}: empty result is not a useful golden"
            lines = ["\t".join(cols)] + ["\t".join(r) for r in want]
            (GOLDEN / f"{stem}.expected.tsv").write_text("\n".join(lines) + "\n")
        print(f"ok {stem}: {len(want)} rows (engine == duckdb)")
    if JSON_OUT:
        import json
        with open(JSON_OUT, "w") as fh:
            json.dump({"sf": SF, "mode": "check" if CHECK else "generate",
                       "n_scripts": len(ORACLES), "n_fail": n_bad,
                       "protocol": ("full parse->lower->compile per script; "
                                    "engine vs DuckDB replay, cell-exact "
                                    "under the golden-harness formatting"),
                       "results": report}, fh, indent=1)
    if n_bad:
        sys.exit(f"{n_bad} scripts disagree with their DuckDB replay")


if __name__ == "__main__":
    main()
