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


@given(pc=st.sampled_from(NUM_COLS), op=st.sampled_from(CMP),
       c=st.integers(0, 40), k=st.sampled_from(["l_returnflag",
                                                "l_linestatus",
                                                "l_suppkey"]),
       dc=st.sampled_from(KEY_COLS), ac=st.sampled_from(NUM_COLS))
@SLOW
def test_nested_filter_distinct_matches_duckdb(eng, duck, pc, op, c, k,
                                               dc, ac):
    """Nested FOREACH block — inner FILTER, projection, DISTINCT —
    through the PARSER (the builder-API twin lives in
    test_property_differential). Groups whose bag filters empty must
    still appear with COUNT 0 / SUM null."""
    sql_op = "=" if op == "==" else ("<>" if op == "!=" else op)
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        g = GROUP li BY {k};
        s = FOREACH g {{
            f = FILTER li BY {pc} {op} {c}.0;
            p = f.{dc};
            d = DISTINCT p;
            GENERATE group AS k, COUNT(d) AS nd, SUM(f.{ac}) AS a,
                     COUNT_STAR(f) AS n;
        }};
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(f"""
        SELECT {k} AS k,
               COUNT(DISTINCT {dc}) FILTER (WHERE {pc} {sql_op} {c}) AS nd,
               SUM({ac}) FILTER (WHERE {pc} {sql_op} {c}) AS a,
               COUNT(*) FILTER (WHERE {pc} {sql_op} {c}) AS n
        FROM li GROUP BY {k}
    """).fetchall())
    assert got == want


@given(k=st.sampled_from(["l_returnflag", "l_linestatus", "l_suppkey"]),
       ac=st.sampled_from(NUM_COLS), n=st.integers(1, 5),
       desc=st.booleans())
@SLOW
def test_nested_order_limit_matches_duckdb(eng, duck, k, ac, n, desc):
    """Nested FOREACH inner ORDER (deterministic composite) + LIMIT:
    per-group top-n, against a row_number() window oracle."""
    d = "DESC" if desc else "ASC"
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        g = GROUP li BY {k};
        s = FOREACH g {{
            o = ORDER li BY {ac} {d}, l_orderkey, l_linenumber;
            t = LIMIT o {n};
            GENERATE group AS k, SUM(t.{ac}) AS a, COUNT_STAR(t) AS cnt;
        }};
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(f"""
        SELECT k, SUM({ac}) AS a, COUNT(*) AS cnt FROM (
            SELECT {k} AS k, {ac}, row_number() OVER (
                PARTITION BY {k}
                ORDER BY {ac} {d}, l_orderkey, l_linenumber) AS rn
            FROM li) WHERE rn <= {n} GROUP BY k
    """).fetchall())
    assert got == want


@given(c=st.integers(0, 45), agg=st.sampled_from(AGGS))
@SLOW
def test_cogroup_matches_duckdb(eng, duck, c, agg):
    """COGROUP through the parser: one side filtered so bags go empty —
    COUNT_STAR over an empty bag is 0, SUM is null; the group row
    survives when EITHER side is non-empty (full-outer oracle)."""
    duck.sql(f"CREATE VIEW IF NOT EXISTS ords AS "
             f"SELECT * FROM '{SF}/orders.parquet'")
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        o = LOAD '{SF}/orders.parquet';
        fl = FILTER li BY l_quantity > {c}.0;
        cg = COGROUP fl BY l_orderkey, o BY o_orderkey;
        s = FOREACH cg GENERATE group AS k, COUNT_STAR(fl) AS nl,
                                COUNT_STAR(o) AS no,
                                {agg}(fl.l_extendedprice) AS a;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(f"""
        WITH a AS (SELECT l_orderkey AS k, COUNT(*) AS nl,
                          {agg}(l_extendedprice) AS a
                   FROM li WHERE l_quantity > {c} GROUP BY 1),
             b AS (SELECT o_orderkey AS k, COUNT(*) AS no
                   FROM ords GROUP BY 1)
        SELECT COALESCE(a.k, b.k) AS k, COALESCE(nl, 0) AS nl,
               COALESCE(no, 0) AS no, a.a AS a
        FROM a FULL OUTER JOIN b ON a.k = b.k
    """).fetchall())
    assert got == want


@given(shape=st.sampled_from(["CUBE", "ROLLUP"]), agg=st.sampled_from(AGGS),
       ac=st.sampled_from(NUM_COLS))
@SLOW
def test_cube_rollup_matches_duckdb(eng, duck, shape, agg, ac):
    """CUBE / ROLLUP through the parser vs SQL grouping sets (rolled-up
    dimensions surface as NULL in both)."""
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        c = CUBE li BY {shape}(l_returnflag, l_linestatus);
        s = FOREACH c GENERATE group.l_returnflag AS k1,
                               group.l_linestatus AS k2,
                               {agg}(li.{ac}) AS a, COUNT(li) AS n;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(f"""
        SELECT l_returnflag AS k1, l_linestatus AS k2,
               {agg}({ac}) AS a, COUNT(*) AS n
        FROM li GROUP BY {shape}(l_returnflag, l_linestatus)
    """).fetchall())
    assert got == want


@given(pc=st.sampled_from(NUM_COLS), c1=st.integers(0, 50),
       c2=st.integers(0, 50), k=st.sampled_from(["l_returnflag",
                                                 "l_linestatus"]),
       ac=st.sampled_from(NUM_COLS))
@SLOW
def test_split_union_matches_duckdb(eng, duck, pc, c1, c2, k, ac):
    """SPLIT conditions are INDEPENDENT (not if-else): overlapping
    branches duplicate rows, and UNION keeps the duplicates."""
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        SPLIT li INTO a IF {pc} < {c1}.0, b IF {pc} >= {c2}.0,
                      rest OTHERWISE;
        u = UNION a, b;
        g = GROUP u BY {k};
        s = FOREACH g GENERATE group AS k, COUNT_STAR(u) AS n,
                               SUM(u.{ac}) AS sm;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(f"""
        WITH u AS (SELECT * FROM li WHERE {pc} < {c1}
                   UNION ALL SELECT * FROM li WHERE {pc} >= {c2})
        SELECT {k} AS k, COUNT(*) AS n, SUM({ac}) AS sm FROM u GROUP BY {k}
    """).fetchall())
    assert got == want


@given(c=st.integers(0, 45), d=st.integers(1, 9), m=st.integers(1, 7),
       thr=st.integers(10, 40))
@SLOW
def test_expression_matrix_matches_duckdb(eng, duck, c, d, m, thr):
    """bincond / CASE WHEN / truncating int division / MOD / CONCAT /
    datetime extraction through the parser, in one projection."""
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        s = FOREACH li GENERATE l_orderkey AS k1, l_linenumber AS k2,
            (l_quantity > {c}.0 ? l_extendedprice : l_discount) AS bc,
            (CASE WHEN l_quantity >= {thr}.0 THEN 'big' ELSE 'small' END)
                AS cs,
            (int)l_partkey / {d} AS q,
            l_partkey % {m} AS r,
            CONCAT(l_returnflag, l_linestatus) AS cc,
            GetYear(l_shipdate) AS y, GetMonth(l_shipdate) AS mo;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(f"""
        SELECT l_orderkey AS k1, l_linenumber AS k2,
               CASE WHEN l_quantity > {c} THEN l_extendedprice
                    ELSE l_discount END AS bc,
               CASE WHEN l_quantity >= {thr} THEN 'big' ELSE 'small' END
                   AS cs,
               CAST(l_partkey AS INT) // {d} AS q,
               l_partkey % {m} AS r,
               l_returnflag || l_linestatus AS cc,
               CAST(year(l_shipdate) AS INT) AS y,
               CAST(month(l_shipdate) AS INT) AS mo
        FROM li
    """).fetchall())
    assert got == want


@given(k=st.sampled_from(["l_returnflag", "l_linestatus", "l_suppkey"]),
       dense=st.booleans(), desc=st.booleans())
@SLOW
def test_rank_matches_duckdb(eng, duck, k, dense, desc):
    """RANK BY with ties (rank) and DENSE (dense_rank) through the
    parser vs SQL window ranks."""
    d = "DESC" if desc else "ASC"
    mode = "DENSE" if dense else ""
    fn = "dense_rank" if dense else "rank"
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        r = RANK li BY {k} {d} {mode};
        s = FOREACH r GENERATE rank_li AS rk, l_orderkey AS k1,
                               l_linenumber AS k2;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(f"""
        SELECT {fn}() OVER (ORDER BY {k} {d}) AS rk,
               l_orderkey AS k1, l_linenumber AS k2 FROM li
    """).fetchall())
    assert got == want


@given(how=st.sampled_from(["LEFT", "RIGHT", "FULL"]),
       c=st.integers(0, 30000), agg=st.sampled_from(AGGS))
@SLOW
def test_outer_join_matches_duckdb(eng, duck, how, c, agg):
    """LEFT/RIGHT/FULL OUTER JOIN through the parser, one side
    filtered so unmatched rows exercise the null-padding, then grouped
    over a nullable key."""
    duck.sql(f"CREATE VIEW IF NOT EXISTS ords AS "
             f"SELECT * FROM '{SF}/orders.parquet'")
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        o = LOAD '{SF}/orders.parquet';
        fo = FILTER o BY o_custkey < {c};
        j = JOIN li BY l_orderkey {how} OUTER, fo BY o_orderkey;
        g = GROUP j BY o_orderpriority;
        s = FOREACH g GENERATE group AS k, COUNT_STAR(j) AS n,
                               {agg}(j.l_quantity) AS a;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(f"""
        WITH fo AS (SELECT * FROM ords WHERE o_custkey < {c})
        SELECT o_orderpriority AS k, COUNT(*) AS n, {agg}(l_quantity) AS a
        FROM li {how} OUTER JOIN fo ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """).fetchall())
    assert got == want


@given(n=st.integers(1, 40))
@SLOW
def test_tokenize_wordcount_matches_duckdb(eng, duck, n):
    """The canonical Pig wordcount — TOKENIZE + FLATTEN + GROUP +
    COUNT — over the documents fixture vs a DuckDB regexp split
    (TOKENIZE delimiters: whitespace and " , ( ) *)."""
    duck.sql(f"CREATE VIEW IF NOT EXISTS docs AS "
             f"SELECT * FROM '{SF}/documents.parquet'")
    rels = run_script(eng, f"""
        d = LOAD '{SF}/documents.parquet';
        lim = LIMIT d {n};
        w = FOREACH lim GENERATE FLATTEN(TOKENIZE(text)) AS word;
        g = GROUP w BY word;
        s = FOREACH g GENERATE group AS word, COUNT_STAR(w) AS n;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(f"""
        WITH lim AS (SELECT * FROM docs ORDER BY doc_id LIMIT {n}),
        toks AS (SELECT unnest(regexp_split_to_array(
                     text, '[ \t\n\r\f",()*]+')) AS word FROM lim)
        SELECT word, COUNT(*) AS n FROM toks WHERE word <> ''
        GROUP BY word
    """).fetchall())
    assert got == want


@given(k=st.sampled_from(["l_returnflag", "l_linestatus"]),
       v=st.sampled_from(NUM_COLS))
@SLOW
def test_map_access_matches_duckdb(eng, duck, k, v):
    """TOMAP + # access + KEYSET/VALUELIST SIZE through the parser —
    map construction and projection round-trip."""
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        m = FOREACH li GENERATE l_orderkey AS k1, l_linenumber AS k2,
                                TOMAP('k', {k}, 'v', (chararray){v}) AS mp;
        s = FOREACH m GENERATE k1, k2, mp#'k' AS kv,
                               (double)(mp#'v') AS vv, SIZE(mp) AS sz;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(f"""
        SELECT l_orderkey AS k1, l_linenumber AS k2, {k} AS kv,
               CAST(CAST({v} AS VARCHAR) AS DOUBLE) AS vv,
               CAST(2 AS BIGINT) AS sz
        FROM li
    """).fetchall())
    assert got == want


@given(mult=st.floats(0.5, 2.0), agg=st.sampled_from(["AVG", "MAX", "MIN"]),
       ac=st.sampled_from(NUM_COLS))
@SLOW
def test_scalar_of_relation_matches_duckdb(eng, duck, mult, agg, ac):
    """Scalar-of-relation: a 1-row aggregate used per-row in a FILTER
    (Pig's implicit scalar cast) vs a SQL scalar subquery."""
    m = round(mult, 3)
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        g = GROUP li ALL;
        s = FOREACH g GENERATE {agg}(li.{ac}) AS v;
        f = FILTER li BY {ac} > {m} * s.v;
        p = FOREACH f GENERATE l_orderkey AS k1, l_linenumber AS k2;
    """)
    got = norm(tuple(r) for r in rels["p"].df().collect())
    want = norm(duck.sql(f"""
        SELECT l_orderkey AS k1, l_linenumber AS k2 FROM li
        WHERE {ac} > {m} * (SELECT {agg}({ac}) FROM li)
    """).fetchall())
    assert got == want


@given(c=st.integers(20, 48))
@SLOW
def test_cogroup_inner_matches_duckdb(eng, duck, c):
    """COGROUP a BY k INNER, b BY k: groups where a's bag is empty
    DROP (inner side), while b-empty groups survive."""
    duck.sql(f"CREATE VIEW IF NOT EXISTS ords AS "
             f"SELECT * FROM '{SF}/orders.parquet'")
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        o = LOAD '{SF}/orders.parquet';
        fl = FILTER li BY l_quantity > {c}.0;
        cg = COGROUP fl BY l_orderkey INNER, o BY o_orderkey;
        s = FOREACH cg GENERATE group AS k, COUNT_STAR(fl) AS nl,
                                COUNT_STAR(o) AS no;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(f"""
        WITH a AS (SELECT l_orderkey AS k, COUNT(*) AS nl
                   FROM li WHERE l_quantity > {c} GROUP BY 1),
             b AS (SELECT o_orderkey AS k, COUNT(*) AS no
                   FROM ords GROUP BY 1)
        SELECT a.k AS k, a.nl, COALESCE(b.no, 0) AS no
        FROM a LEFT JOIN b ON a.k = b.k
    """).fetchall())
    assert got == want


@given(c=st.integers(0, 25))
@SLOW
def test_union_onschema_matches_duckdb(eng, duck, c):
    """UNION ONSCHEMA with differing column sets: missing columns fill
    with null, matching positions by NAME (not position)."""
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        a = FOREACH li GENERATE l_orderkey AS k, l_quantity AS q;
        fb = FILTER li BY l_quantity > {c}.0;
        b = FOREACH fb GENERATE l_orderkey AS k, l_extendedprice AS p;
        u = UNION ONSCHEMA a, b;
        g = GROUP u BY k;
        s = FOREACH g GENERATE group AS k, COUNT(u.q) AS nq,
                               COUNT(u.p) AS np, SUM(u.q) AS sq;
    """)
    got = norm(tuple(r) for r in rels["s"].df().collect())
    want = norm(duck.sql(f"""
        WITH u AS (
            SELECT l_orderkey AS k, l_quantity AS q, NULL::DOUBLE AS p
            FROM li
            UNION ALL
            SELECT l_orderkey AS k, NULL AS q, l_extendedprice AS p
            FROM li WHERE l_quantity > {c})
        SELECT k, COUNT(q) AS nq, COUNT(p) AS np, SUM(q) AS sq
        FROM u GROUP BY k
    """).fetchall())
    assert got == want


@given(c1=st.integers(0, 30), c2=st.integers(0, 30))
@SLOW
def test_operator_precedence_matches_duckdb(eng, duck, c1, c2):
    """Precedence/associativity: left-assoc subtraction chains, unary
    minus, * over -, AND over OR, NOT binding — the classic parser
    mistakes, against SQL which shares the same rules."""
    rels = run_script(eng, f"""
        li = LOAD '{SF}/lineitem.parquet';
        e = FOREACH li GENERATE l_orderkey AS k1, l_linenumber AS k2,
            l_quantity - l_discount - l_tax AS a,
            l_quantity - l_discount * 2.0 AS b,
            -l_discount + l_quantity AS c,
            (l_quantity - l_discount) * 2.0 - -l_tax AS d;
        f = FILTER e BY NOT a > {c1}.0 OR b < {c2}.0 AND d > 1.0;
    """)
    got = norm(tuple(r) for r in rels["f"].df().collect())
    want = norm(duck.sql(f"""
        WITH e AS (SELECT l_orderkey AS k1, l_linenumber AS k2,
                          l_quantity - l_discount - l_tax AS a,
                          l_quantity - l_discount * 2.0 AS b,
                          -l_discount + l_quantity AS c,
                          (l_quantity - l_discount) * 2.0 - -l_tax AS d
                   FROM li)
        SELECT * FROM e
        WHERE NOT a > {c1} OR b < {c2} AND d > 1.0
    """).fetchall())
    assert got == want
