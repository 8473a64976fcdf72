"""Script-level differential fuzzing: hypothesis draws parameters, the
SAME query is built twice — once as Pig Latin through run_script (the
full parser → lowering → Catalyst path) and once as SQL for DuckDB —
and results must match. Complements test_property_differential, which
exercises the Python builder API but not the parser."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spork_spark.parser import run_script

SF = "/root/testdata/sf0.001"

import os

SLOW = settings(
    max_examples=int(os.environ.get("SPORK_FUZZ_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture])

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
KEY_COLS = ["l_returnflag", "l_linestatus", "l_partkey", "l_suppkey"]
CMP = ["<", "<=", ">", ">=", "==", "!="]
AGGS = ["SUM", "MIN", "MAX", "AVG"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW li AS SELECT * FROM '{SF}/lineitem.parquet'")
    return con


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(round(x, 6) if isinstance(x, float) else x
                         for x in r))
    return sorted(out, key=repr)


@given(pc=st.sampled_from(NUM_COLS), op=st.sampled_from(CMP),
       c=st.integers(0, 40), k=st.sampled_from(KEY_COLS),
       agg=st.sampled_from(AGGS), ac=st.sampled_from(NUM_COLS))
@SLOW
def test_filter_group_agg_matches_duckdb(eng, duck, pc, op, c, k, agg, ac):
    sql_op = "=" if op == "==" else ("<>" if op == "!=" else op)
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        f = FILTER li BY {pc} {op} {c}.0;
        g = GROUP f BY {k};
        s = FOREACH g GENERATE group AS k, {agg}(f.{ac}) AS a,
                               COUNT_STAR(f) AS n;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(
        f"SELECT {k} AS k, {agg}({ac}) AS a, COUNT(*) AS n FROM li "
        f"WHERE {pc} {sql_op} {c} GROUP BY {k}").fetchall())
    assert got == want


@given(k=st.sampled_from(KEY_COLS), n=st.integers(1, 30),
       col=st.sampled_from(NUM_COLS), desc=st.booleans())
@SLOW
def test_order_limit_matches_duckdb(eng, duck, k, n, col, desc):
    """ORDER BY a deterministic composite (key, value, orderkey,
    linenumber) + LIMIT must pick the same rows as SQL."""
    d = "DESC" if desc else "ASC"
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        o = ORDER li BY {col} {d}, l_orderkey, l_linenumber;
        t = LIMIT o {n};
        s = FOREACH t GENERATE l_orderkey AS k1, l_linenumber AS k2,
                               {col} AS v;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(
        f"SELECT l_orderkey AS k1, l_linenumber AS k2, {col} AS v FROM li "
        f"ORDER BY {col} {d}, l_orderkey, l_linenumber LIMIT {n}"
    ).fetchall())
    assert got == want


@given(k2=st.sampled_from(["l_linestatus", "l_suppkey"]),
       agg=st.sampled_from(AGGS), ac=st.sampled_from(NUM_COLS),
       c=st.integers(1, 50))
@SLOW
def test_flatten_group_having_matches_duckdb(eng, duck, k2, agg, ac, c):
    """Multi-key GROUP + FLATTEN(group) + post-agg FILTER — Pig's
    HAVING idiom."""
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        g = GROUP li BY (l_returnflag, {k2});
        s = FOREACH g GENERATE FLATTEN(group) AS (k1, k2),
                               {agg}(li.{ac}) AS a, COUNT_STAR(li) AS n;
        h = FILTER s BY n > {c};
    """)
    got = norm(tuple(r) for r in rels["h"].df().collect())
    want = norm(duck.sql(
        f"SELECT l_returnflag AS k1, {k2} AS k2, {agg}({ac}) AS a, "
        f"COUNT(*) AS n FROM li GROUP BY 1, 2 HAVING COUNT(*) > {c}"
    ).fetchall())
    assert got == want


@given(op=st.sampled_from(CMP), c=st.integers(0, 30000),
       agg=st.sampled_from(AGGS))
@SLOW
def test_join_group_matches_duckdb(eng, duck, op, c, agg):
    sql_op = "=" if op == "==" else ("<>" if op == "!=" else op)
    duck.sql(f"CREATE VIEW IF NOT EXISTS ords AS "
             f"SELECT * FROM '{SF}/orders.parquet'")
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        o = LOAD '{SF}/orders.parquet';
        fo = FILTER o BY o_custkey {op} {c};
        j = JOIN li BY l_orderkey, fo BY o_orderkey;
        g = GROUP j BY o_orderpriority;
        s = FOREACH g GENERATE group AS k, {agg}(j.l_quantity) AS a,
                               COUNT_STAR(j) AS n;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(
        f"SELECT o_orderpriority AS k, {agg}(l_quantity) AS a, "
        f"COUNT(*) AS n FROM li JOIN ords ON l_orderkey = o_orderkey "
        f"WHERE o_custkey {sql_op} {c} GROUP BY o_orderpriority"
    ).fetchall())
    assert got == want
