"""Property-based differential testing (beyond the reference — SURVEY.md
§5.1 notes Pig has no randomized tests): hypothesis generates small
tables + predicates; the engine's result must match DuckDB running the
equivalent SQL on the same data. Catches semantic drift the fixed oracle
queries can't."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spork_spark import col, fn, lit

# rows: (k: int|None, v: int-valued double|None, s: str)
row = st.tuples(
    st.one_of(st.none(), st.integers(0, 5)),
    st.one_of(st.none(), st.integers(-10, 10).map(float)),
    st.sampled_from(["a", "b", "abc", "", "Zz"]),
)
tables = st.lists(row, min_size=1, max_size=30)
cmp_op = st.sampled_from(["<", "<=", "==", ">", ">=", "!="])
threshold = st.integers(-5, 5)

import os as _os

# SPORK_FUZZ_EXAMPLES raises the per-test example budget for soak runs
# (e.g. SPORK_FUZZ_EXAMPLES=50 python -m pytest tests/test_property_differential.py)
SLOW = settings(max_examples=int(_os.environ.get("SPORK_FUZZ_EXAMPLES", "12")),
                deadline=None,
                suppress_health_check=[HealthCheck.too_slow,
                                       HealthCheck.function_scoped_fixture])


def mk(spark, rows):
    sdf = spark.createDataFrame(rows, "k int, v double, s string")
    pdf = pd.DataFrame(rows, columns=["k", "v", "s"])
    # pin dtypes: an all-None column otherwise registers as object and
    # DuckDB infers an integer type — SUM then widens to HUGEINT and the
    # typed comparison (rightly) flags the seam
    pdf["k"] = pdf["k"].astype("Int32")
    pdf["v"] = pdf["v"].astype("float64")
    con = duckdb.connect()
    con.register("t", pdf)
    return sdf, con


def norm(rows_):
    out = [tuple("∅" if x is None else x for x in r) for r in rows_]
    return sorted(out, key=repr)


@given(data=tables, op=cmp_op, c=threshold)
@SLOW
def test_filter_matches_duckdb(eng, spark, data, op, c):
    sdf, con = mk(spark, data)
    expr = {"<": col("v") < float(c), "<=": col("v") <= float(c),
            "==": col("v") == float(c), ">": col("v") > float(c),
            ">=": col("v") >= float(c), "!=": col("v") != float(c)}[op]
    got = norm(tuple(r) for r in eng.from_df(sdf).filter(expr).collect())
    want = norm(con.sql(f"SELECT * FROM t WHERE v {op} {c}").fetchall())
    assert got == want          # null predicate drops rows in both


@given(data=tables)
@SLOW
def test_group_agg_matches_duckdb(eng, spark, data):
    sdf, con = mk(spark, data)
    rel = (eng.from_df(sdf, alias="x").group_by(col("k"))
           .foreach(col("group").alias("k"),
                    fn("COUNT", col("x").get("v")).alias("c"),
                    fn("SUM", col("x").get("v")).alias("sm"),
                    fn("MIN", col("x").get("s")).alias("mn")))
    got = norm(tuple(r) for r in rel.collect())
    want = norm(con.sql(
        "SELECT k, COUNT(v), SUM(v), MIN(s) FROM t GROUP BY k").fetchall())
    assert got == want          # null keys group together in both


@given(data=tables, n=st.integers(1, 5))
@SLOW
def test_order_limit_matches_duckdb(eng, spark, data, n):
    sdf, con = mk(spark, data)
    rel = (eng.from_df(sdf)
           .foreach(col("v").alias("v"), col("s").alias("s"))
           .order_by(col("v"), col("s")).limit(n))
    got = [tuple("∅" if x is None else x for x in r) for r in rel.collect()]
    want = [tuple("∅" if x is None else x for x in r) for r in con.sql(
        f"SELECT v, s FROM t ORDER BY v NULLS FIRST, s LIMIT {n}").fetchall()]
    assert got == want          # nulls-first ASC in both


@given(data=tables)
@SLOW
def test_distinct_union_roundtrip(eng, spark, data):
    sdf, con = mk(spark, data)
    r = eng.from_df(sdf)
    got_d = norm(tuple(x) for x in r.distinct().collect())
    want_d = norm(con.sql("SELECT DISTINCT * FROM t").fetchall())
    assert got_d == want_d
    assert len(r.union(r).collect()) == 2 * len(data)   # no dedup


@SLOW
@given(data=tables)
def test_rank_by_matches_duckdb(eng, spark, data):
    """Scalable RANK BY (distinct-key prefix-sum) ≡ SQL rank()/dense_rank()
    on arbitrary keys incl. ties and nulls (nulls rank smallest)."""
    sdf, con = mk(spark, data)
    r = eng.from_df(sdf).rank((col("v"), True)).df() \
           .select("rank", "k", "v", "s")
    got = norm(tuple(x) for x in r.collect())
    exp = norm(con.sql(
        "SELECT rank() OVER (ORDER BY v ASC NULLS FIRST) AS rank, k, v, s "
        "FROM t").fetchall())
    assert got == exp
    rd = eng.from_df(sdf).rank((col("v"), False), dense=True).df() \
            .select("rank", "k", "v", "s")
    got_d = norm(tuple(x) for x in rd.collect())
    exp_d = norm(con.sql(
        "SELECT dense_rank() OVER (ORDER BY v DESC NULLS LAST) AS rank, "
        "k, v, s FROM t").fetchall())
    assert got_d == exp_d


# ---------------------------------------------------------------------------
# expression-language fuzz: random Pig expression TEXT through the parser,
# mirrored SQL through DuckDB — catches precedence / bincond / three-valued
# logic / promotion drift in the tokenizer+compiler, not just plan shapes
# ---------------------------------------------------------------------------

@st.composite
def num_expr(draw, depth=0):
    """Returns (pig_text, sql_text) for a numeric expression over columns
    k (int, nullable) and v (double, nullable)."""
    if depth >= 3 or draw(st.booleans()):
        return draw(st.sampled_from([
            ("k", "k"), ("v", "v"), ("3", "3"), ("2", "2"),
            ("1.5", "1.5"), ("-4", "-4"),
        ]))
    kind = draw(st.sampled_from(["arith", "bincond", "case_simple"]))
    if kind == "arith":
        lp, ls = draw(num_expr(depth + 1))
        rp, rs = draw(num_expr(depth + 1))
        op = draw(st.sampled_from(["+", "-", "*"]))
        return (f"({lp} {op} {rp})", f"({ls} {op} {rs})")
    if kind == "case_simple":
        tp, ts = draw(num_expr(depth + 1))
        fp, fs = draw(num_expr(depth + 1))
        w = draw(st.integers(0, 3))
        return (f"(CASE k WHEN {w} THEN {tp} ELSE {fp} END)",
                f"(CASE k WHEN {w} THEN {ts} ELSE {fs} END)")
    cp, cs = draw(bool_expr(depth + 1))
    tp, ts = draw(num_expr(depth + 1))
    fp, fs = draw(num_expr(depth + 1))
    return (f"({cp} ? {tp} : {fp})",
            f"(CASE WHEN {cs} THEN {ts} ELSE {fs} END)")


@st.composite
def bool_expr(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        lp, ls = draw(num_expr(depth + 1))
        rp, rs = draw(num_expr(depth + 1))
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "==", "!="]))
        sql_op = "=" if op == "==" else ("<>" if op == "!=" else op)
        return (f"({lp} {op} {rp})", f"({ls} {sql_op} {rs})")
    kind = draw(st.sampled_from(["and", "or", "not", "isnull", "in",
                                 "matches"]))
    if kind == "in":
        vals = sorted(draw(st.sets(st.integers(0, 5), min_size=1,
                                   max_size=3)))
        lst = ", ".join(map(str, vals))
        return (f"(k IN ({lst}))", f"(k IN ({lst}))")
    if kind == "matches":
        # Pig matches = FULL-string regex (anchored); DuckDB equivalent is
        # regexp_full_match
        rx = draw(st.sampled_from(["a.*", ".*b.*", "[A-Za-z]+", "", "Z."]))
        return (f"(s matches '{rx}')", f"regexp_full_match(s, '{rx}')")
    if kind == "isnull":
        c = draw(st.sampled_from(["k", "v"]))
        neg = draw(st.booleans())
        return ((f"({c} is not null)", f"({c} IS NOT NULL)") if neg
                else (f"({c} is null)", f"({c} IS NULL)"))
    if kind == "not":
        p, s = draw(bool_expr(depth + 1))
        return (f"(NOT {p})", f"(NOT {s})")
    lp, ls = draw(bool_expr(depth + 1))
    rp, rs = draw(bool_expr(depth + 1))
    op = kind.upper()
    return (f"({lp} {op} {rp})", f"({ls} {op} {rs})")


@given(data=tables, e=num_expr())
@SLOW
def test_generate_expression_matches_duckdb(eng, spark, data, e):
    """FOREACH … GENERATE <expr>: value + null propagation parity."""
    from spork_spark.parser import run_script
    pig, sql = e
    sdf, con = mk(spark, data)
    t = eng.from_df(sdf, alias="t_fuzz")
    rels = run_script(eng, f"x = FOREACH t_fuzz GENERATE {pig} AS r;",
                      relations={"t_fuzz": t})
    got = norm((None if r["r"] is None else round(float(r["r"]), 6),)
               for r in rels["x"].df().collect())
    want = norm((None if r[0] is None else round(float(r[0]), 6),)
                for r in con.sql(f"SELECT {sql} AS r FROM t").fetchall())
    assert got == want


@given(data=tables, e=bool_expr())
@SLOW
def test_filter_expression_matches_duckdb(eng, spark, data, e):
    """FILTER … BY <expr>: three-valued logic parity (null drops)."""
    from spork_spark.parser import run_script
    pig, sql = e
    sdf, con = mk(spark, data)
    t = eng.from_df(sdf, alias="t_fuzz2")
    rels = run_script(eng, f"x = FILTER t_fuzz2 BY {pig};",
                      relations={"t_fuzz2": t})
    got = norm(tuple(r) for r in rels["x"].df().collect())
    want = norm(con.sql(f"SELECT * FROM t WHERE {sql}").fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# pipeline fuzz: random multi-operator scripts (FILTER* → DISTINCT? →
# GROUP-agg?) through the full parser, mirrored as nested SQL — catches
# operator-composition drift (schema propagation, fusion, null keys)
# ---------------------------------------------------------------------------

@st.composite
def pipeline(draw):
    """Returns (pig_statements, sql_text) over seed relation t_pipe."""
    sql = "SELECT * FROM t"
    pig, cur, n = [], "t_pipe", 0
    for _ in range(draw(st.integers(1, 2))):
        p, sq = draw(bool_expr())
        nxt = f"r{n}"
        n += 1
        pig.append(f"{nxt} = FILTER {cur} BY {p};")
        sql = f"SELECT * FROM ({sql}) sub{n} WHERE {sq}"
        cur = nxt
    if draw(st.booleans()):
        nxt = f"r{n}"
        n += 1
        pig.append(f"{nxt} = DISTINCT {cur};")
        sql = f"SELECT DISTINCT * FROM ({sql}) sub{n}"
        cur = nxt
    if draw(st.booleans()):
        nxt = f"r{n}"
        n += 1
        # COUNT(bag) counts rows whose FIRST field is non-null (Pig);
        # mirror as COUNT(k)
        pig.append(f"{nxt} = FOREACH (GROUP {cur} BY k) GENERATE "
                   f"group AS k, COUNT({cur}) AS c, SUM({cur}.v) AS sm;")
        sql = (f"SELECT k, COUNT(k) AS c, SUM(v) AS sm "
               f"FROM ({sql}) sub{n} GROUP BY k")
        cur = nxt
    return pig, sql, cur


@given(data=tables, pl=pipeline())
@SLOW
def test_pipeline_matches_duckdb(eng, spark, data, pl):
    from spork_spark.parser import run_script
    stmts, sql, last = pl
    sdf, con = mk(spark, data)
    t = eng.from_df(sdf, alias="t_pipe")
    rels = run_script(eng, "\n".join(stmts), relations={"t_pipe": t})
    got = norm(tuple(r) for r in rels[last].df().collect())
    want = norm(con.sql(sql).fetchall())
    assert got == want


@given(data=tables, data2=tables,
       how=st.sampled_from(["", "LEFT OUTER", "FULL OUTER"]))
@SLOW
def test_join_matches_duckdb(eng, spark, data, data2, how):
    """Random equi-joins (inner/left/full) on a nullable key: null keys
    never match, outer sides null-fill, colliding names qualify — all
    identical to SQL."""
    from spork_spark.parser import run_script
    sdf, con = mk(spark, data)
    sdf2 = spark.createDataFrame(data2, "k int, v double, s string")
    con.register("t2", pd.DataFrame(data2, columns=["k", "v", "s"]))
    a = eng.from_df(sdf, alias="ja")
    b = eng.from_df(sdf2, alias="jb")
    rels = run_script(eng, f"x = JOIN ja BY k {how}, jb BY k;",
                      relations={"ja": a, "jb": b})
    got = norm(tuple(r) for r in rels["x"].df().collect())
    sql_how = {"": "JOIN", "LEFT OUTER": "LEFT JOIN",
               "FULL OUTER": "FULL JOIN"}[how]
    want = norm(con.sql(
        f"SELECT a.k, a.v, a.s, b.k, b.v, b.s FROM t a {sql_how} t2 b "
        f"ON a.k = b.k").fetchall())
    assert got == want


@given(data=tables, c=threshold)
@SLOW
def test_nested_filter_agg_matches_duckdb(eng, spark, data, c):
    """Nested FOREACH { FILTER; GENERATE COUNT/SUM }: fuses to
    agg(when(cond, x)) with Pig COUNT semantics (non-null first field of
    the filtered bag, which is k here)."""
    from spork_spark.parser import run_script
    sdf, con = mk(spark, data)
    t = eng.from_df(sdf, alias="t_nf")
    rels = run_script(eng, f"""
        g = FOREACH (GROUP t_nf BY s) {{
            f = FILTER t_nf BY v > {c}.0;
            GENERATE group AS s, COUNT(f) AS n, SUM(f.v) AS sm;
        }};
    """, relations={"t_nf": t})
    got = norm(tuple(r) for r in rels["g"].df().collect())
    want = norm(con.sql(f"""
        SELECT s, COUNT(CASE WHEN v > {c} THEN k END) AS n,
               SUM(CASE WHEN v > {c} THEN v END) AS sm
        FROM t GROUP BY s
    """).fetchall())
    assert got == want


@given(data=tables, n=st.integers(1, 3))
@SLOW
def test_nested_order_limit_agg_matches_duckdb(eng, spark, data, n):
    """Nested FOREACH { ORDER; LIMIT n; GENERATE SUM }: per-group top-n
    aggregation ≡ SQL row_number window mirror (ties broken identically by
    a total sort key)."""
    from spork_spark.parser import run_script
    sdf, con = mk(spark, data)
    t = eng.from_df(sdf, alias="t_tl")
    rels = run_script(eng, f"""
        g = FOREACH (GROUP t_tl BY s) {{
            srt = ORDER t_tl BY v DESC, k DESC;
            lim = LIMIT srt {n};
            GENERATE group AS s, SUM(lim.v) AS sm;
        }};
    """, relations={"t_tl": t})
    got = norm(tuple(r) for r in rels["g"].df().collect())
    want = norm(con.sql(f"""
        SELECT s, SUM(v) AS sm FROM (
            SELECT s, v, row_number() OVER (
                PARTITION BY s ORDER BY v DESC NULLS LAST, k DESC NULLS LAST
            ) AS rn FROM t) sub
        WHERE rn <= {n} GROUP BY s
    """).fetchall())
    assert got == want


strings = st.lists(st.tuples(st.sampled_from(
    ["", "a", "ab", "abc", "aXbXc", "  pad  ", "ZzZ", "a_b_c", "ααβ"])),
    min_size=1, max_size=12)


@given(data=strings, i=st.integers(0, 4), j=st.integers(0, 6))
@SLOW
def test_string_funcs_match_duckdb(eng, spark, data, i, j):
    """SUBSTRING (0-based, stop-exclusive), INDEXOF (0-based, -1 absent),
    TRIM/UPPER — the index-base divergences vs 1-based SQL, on random
    strings incl. empty/unicode."""
    from spork_spark.parser import run_script
    sdf = spark.createDataFrame(data, "s string")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(data, columns=["s"]))
    t = eng.from_df(sdf, alias="t_str")
    lo, hi = min(i, j), max(i, j)
    rels = run_script(eng, f"""
        x = FOREACH t_str GENERATE SUBSTRING(s, {lo}, {hi}) AS sub,
                                   INDEXOF(s, 'X') AS ix,
                                   UPPER(TRIM(s)) AS up;
    """, relations={"t_str": t})
    got = norm(tuple(r) for r in rels["x"].df().collect())
    want = norm(con.sql(f"""
        SELECT CASE WHEN length(s) < {lo} THEN NULL
                    ELSE substring(s, {lo} + 1, {hi} - {lo}) END AS sub,
               CAST(strpos(s, 'X') - 1 AS INT) AS ix,
               upper(trim(s)) AS up FROM t
    """).fetchall())
    assert got == want


@given(data=tables)
@SLOW
def test_group_flatten_roundtrip(eng, spark, data):
    """GROUP BY k then FLATTEN(bag) reproduces the original multiset
    (bag materialization + explode inverse property; null keys group)."""
    from spork_spark.parser import run_script
    sdf, _ = mk(spark, data)
    t = eng.from_df(sdf, alias="t_rt")
    rels = run_script(eng, """
        g = GROUP t_rt BY k;
        f = FOREACH g GENERATE FLATTEN(t_rt);
    """, relations={"t_rt": t})
    got = norm(tuple(r) for r in rels["f"].df().collect())
    want = norm(tuple(r) for r in data)
    assert got == want


@given(data=tables, data2=tables)
@SLOW
def test_union_onschema_matches_duckdb(eng, spark, data, data2):
    """UNION ONSCHEMA merges by column name, null-padding missing columns
    — DuckDB's UNION ALL BY NAME."""
    from spork_spark.parser import run_script
    sdf, con = mk(spark, data)
    sdf2 = spark.createDataFrame([(k, s) for k, _, s in data2],
                                 "k int, s2 string")
    con.register("t2", pd.DataFrame([(k, s) for k, _, s in data2],
                                    columns=["k", "s2"]))
    a = eng.from_df(sdf, alias="ua")
    b = eng.from_df(sdf2, alias="ub")
    rels = run_script(eng, "x = UNION ONSCHEMA ua, ub;",
                      relations={"ua": a, "ub": b})
    got = norm(tuple(r) for r in rels["x"].df().select("k", "v", "s", "s2")
               .collect())
    want = norm(con.sql(
        "SELECT k, v, s, s2 FROM (SELECT * FROM t UNION ALL BY NAME "
        "SELECT * FROM t2)").fetchall())
    assert got == want


@given(ms=st.lists(st.integers(0, 4102444800000), min_size=1, max_size=15))
@SLOW
def test_datetime_funcs_match_duckdb(eng, spark, ms):
    """ToDate(ms) + GetYear/Month/Day/Hour/Minute/Second + ToUnixTime vs
    DuckDB epoch arithmetic over random instants (UTC session) — pins the
    Joda-to-java.time field mappings."""
    from spork_spark.parser import run_script
    data = [(m,) for m in ms]
    sdf = spark.createDataFrame(data, "ms long")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(data, columns=["ms"]))
    t = eng.from_df(sdf, alias="t_dt")
    rels = run_script(eng, """
        x = FOREACH t_dt GENERATE GetYear(ToDate(ms)) AS y,
                                  GetMonth(ToDate(ms)) AS mo,
                                  GetDay(ToDate(ms)) AS d,
                                  GetHour(ToDate(ms)) AS h,
                                  GetMinute(ToDate(ms)) AS mi,
                                  GetSecond(ToDate(ms)) AS sec,
                                  ToUnixTime(ToDate(ms)) AS ut;
    """, relations={"t_dt": t})
    got = norm(tuple(r) for r in rels["x"].df().collect())
    want = norm(con.sql("""
        SELECT CAST(date_part('year', ts) AS INT) AS y,
               CAST(date_part('month', ts) AS INT) AS mo,
               CAST(date_part('day', ts) AS INT) AS d,
               CAST(date_part('hour', ts) AS INT) AS h,
               CAST(date_part('minute', ts) AS INT) AS mi,
               CAST(date_part('second', ts) AS INT) AS sec,
               CAST(floor(ms / 1000) AS BIGINT) AS ut
        FROM (SELECT ms, to_timestamp(ms / 1000.0) AS ts FROM t)
    """).fetchall())
    assert got == want


@given(data=tables, c1=threshold, c2=threshold)
@SLOW
def test_split_matches_duckdb(eng, spark, data, c1, c2):
    """SPLIT routing: rows may reach several outputs; OTHERWISE catches
    rows matching no predicate (null-safe — a null predicate is not a
    match)."""
    from spork_spark.parser import run_script
    sdf, con = mk(spark, data)
    t = eng.from_df(sdf, alias="t_sp")
    rels = run_script(eng, f"""
        SPLIT t_sp INTO lo IF v < {c1}.0, hi IF v > {c2}.0, rest OTHERWISE;
    """, relations={"t_sp": t})
    for alias, cond in [("lo", f"v < {c1}"), ("hi", f"v > {c2}"),
                        ("rest", f"NOT coalesce(v < {c1}, false) "
                                 f"AND NOT coalesce(v > {c2}, false)")]:
        got = norm(tuple(r) for r in rels[alias].df().collect())
        want = norm(con.sql(f"SELECT * FROM t WHERE {cond}").fetchall())
        assert got == want, alias


@given(data=st.lists(row, min_size=1, max_size=6),
       data2=st.lists(row, min_size=1, max_size=6))
@SLOW
def test_cross_matches_duckdb(eng, spark, data, data2):
    """CROSS = full cartesian product (row counts multiply; no null
    special-casing)."""
    from spork_spark.parser import run_script
    sdf, con = mk(spark, data)
    sdf2 = spark.createDataFrame(data2, "k int, v double, s string")
    con.register("t2", pd.DataFrame(data2, columns=["k", "v", "s"]))
    a = eng.from_df(sdf, alias="ca")
    b = eng.from_df(sdf2, alias="cb")
    rels = run_script(eng, "x = CROSS ca, cb;", relations={"ca": a, "cb": b})
    got = norm(tuple(r) for r in rels["x"].df().collect())
    want = norm(con.sql(
        "SELECT a.k, a.v, a.s, b.k, b.v, b.s FROM t a CROSS JOIN t2 b"
    ).fetchall())
    assert got == want


@given(data=tables)
@SLOW
def test_window_lag_rank_matches_duckdb(eng, spark, data):
    """Window functions over random partitions: lag + rank with a unique
    id tiebreak so both engines see one deterministic order."""
    from spork_spark.plans import expressions as E
    rows = [(i, k, v) for i, (k, v, s) in enumerate(data)]
    sdf = spark.createDataFrame(rows, "id int, k int, v double")
    pdf = pd.DataFrame(rows, columns=["id", "k", "v"])
    con = duckdb.connect()
    con.register("t", pdf)
    w_lag = E.WindowFunc("lag", [col("v")], [col("k")], [(col("id"), True)])
    w_rank = E.WindowFunc("rank", [], [col("k")],
                          [(col("v"), False), (col("id"), True)])
    out = (eng.from_df(sdf, alias="x")
              .foreach(col("id").alias("id"),
                       E.Aliased(w_lag, "pv"),
                       E.Aliased(w_rank, "r"))
              .df().collect())
    got = norm((r.id, r.pv, int(r.r)) for r in out)
    want = norm(con.sql("""
        SELECT id, lag(v) OVER (PARTITION BY k ORDER BY id) AS pv,
               CAST(rank() OVER (PARTITION BY k
                    ORDER BY v DESC NULLS LAST, id) AS INT) AS r
        FROM t""").fetchall())
    assert got == want


@given(data=tables, data2=tables)
@SLOW
def test_cogroup_matches_duckdb(eng, spark, data, data2):
    """COGROUP on a nullable key: bag sizes per group key, absent groups
    give empty (size-0) bags, null keys group together (Pig contract)."""
    a = spark.createDataFrame(data, "k int, v double, s string")
    b = spark.createDataFrame(data2, "k int, v double, s string")
    con = duckdb.connect()
    con.register("ta", pd.DataFrame(data, columns=["k", "v", "s"]))
    con.register("tb", pd.DataFrame(data2, columns=["k", "v", "s"]))
    ra = eng.from_df(a, alias="ra")
    rb = eng.from_df(b, alias="rb")
    cg = ra.cogroup([col("k")], (rb, [col("k")]))
    out = (cg.foreach(col("group").alias("k"),
                      fn("SIZE", col("ra")).alias("na"),
                      fn("SIZE", col("rb")).alias("nb"))
             .df().collect())
    got = norm(tuple(r) for r in out)
    want = norm(con.sql("""
        SELECT COALESCE(ga.k, gb.k) AS k,
               COALESCE(ga.n, 0) AS na, COALESCE(gb.n, 0) AS nb
        FROM (SELECT k, COUNT(*) AS n FROM ta GROUP BY k) ga
        FULL OUTER JOIN (SELECT k, COUNT(*) AS n FROM tb GROUP BY k) gb
          ON ga.k IS NOT DISTINCT FROM gb.k""").fetchall())
    assert got == want


@given(data=tables)
@SLOW
def test_cube_rollup_matches_duckdb(eng, spark, data):
    """CUBE/ROLLUP over nullable dims: real-null dimension values and
    grouping-set null-fills must produce the same row multiset as SQL
    GROUP BY CUBE/ROLLUP (Spark cube == ANSI cube; order-insensitive)."""
    sdf = spark.createDataFrame(data, "k int, v double, s string")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(data, columns=["k", "v", "s"]))
    cubed = (eng.from_df(sdf, alias="x").cube(col("k"), col("s"))
                .foreach(col("group").get("k").alias("k"),
                         col("group").get("s").alias("s"),
                         fn("COUNT_STAR").alias("n"),
                         fn("SUM", col("x").get("v")).alias("sv"))
                .df().collect())
    got = norm(tuple(r) for r in cubed)
    want = norm(con.sql("""
        SELECT k, s, COUNT(*) AS n, SUM(v) AS sv
        FROM t GROUP BY CUBE (k, s)""").fetchall())
    assert got == want
    rolled = (eng.from_df(sdf, alias="x").rollup(col("k"))
                 .foreach(col("group").alias("k"),
                          fn("COUNT_STAR").alias("n"))
                 .df().collect())
    got_r = norm(tuple(r) for r in rolled)
    want_r = norm(con.sql(
        "SELECT k, COUNT(*) AS n FROM t GROUP BY ROLLUP (k)").fetchall())
    assert got_r == want_r


@given(data=tables, data2=tables,
       how=st.sampled_from(["", "LEFT OUTER", "FULL OUTER"]))
@SLOW
def test_multikey_join_matches_duckdb(eng, spark, data, data2, how):
    """Composite (k, s) join keys through the script path: any null key
    component kills the match (SQL AND of equalities), collisions qualify."""
    from spork_spark.parser import run_script
    sdf, con = mk(spark, data)
    sdf2 = spark.createDataFrame(data2, "k int, v double, s string")
    con.register("t2", pd.DataFrame(data2, columns=["k", "v", "s"]))
    a = eng.from_df(sdf, alias="ma")
    b = eng.from_df(sdf2, alias="mb")
    rels = run_script(eng, f"x = JOIN ma BY (k, s) {how}, mb BY (k, s);",
                      relations={"ma": a, "mb": b})
    got = norm(tuple(r) for r in rels["x"].df().collect())
    sql_how = {"": "JOIN", "LEFT OUTER": "LEFT JOIN",
               "FULL OUTER": "FULL JOIN"}[how]
    want = norm(con.sql(
        f"SELECT a.k, a.v, a.s, b.k, b.v, b.s FROM t a {sql_how} t2 b "
        f"ON a.k = b.k AND a.s = b.s").fetchall())
    assert got == want


CASTABLE = st.sampled_from(
    ["1", "2.5", "abc", "", "-3", " 4 ", "1e2", "+5", "3.9", "007",
     "2147483648", "- 5", "4.", ".5", "10000000000", "-2.5"])


@given(data=st.lists(st.tuples(st.one_of(st.none(), CASTABLE)),
                     min_size=1, max_size=25))
@SLOW
def test_string_cast_matches_pig_semantics(eng, spark, data):
    """The all-bytearray path (SURVEY.md §7 hard part 4): (int)/(long)/
    (double) casts of untyped strings. Engine = Spark legacy cast (ANSI
    off): trims, truncates decimal strings toward zero for integrals,
    rejects exponents for integrals, null on overflow/garbage — POCast's
    null-on-failure contract. Oracle mirrors each rule explicitly."""
    sdf = spark.createDataFrame(data, "s string")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(data, columns=["s"]))
    out = (eng.from_df(sdf)
              .foreach(col("s").alias("s"),
                       col("s").cast("int").alias("i"),
                       col("s").cast("long").alias("l"),
                       col("s").cast("double").alias("d"))
              .df().collect())
    got = norm(tuple(r) for r in out)
    num = r"'[+-]?(\d+\.?\d*|\.\d+)'"
    trunc = "trunc(TRY_CAST(trim(s) AS DOUBLE))"
    want = norm(con.sql(f"""
        SELECT s,
               CASE WHEN regexp_full_match(trim(s), {num})
                     AND abs({trunc}) <= 2147483647
                    THEN CAST({trunc} AS INT) END AS i,
               CASE WHEN regexp_full_match(trim(s), {num})
                     AND abs({trunc}) <= 9223372036854775807
                    THEN CAST({trunc} AS BIGINT) END AS l,
               TRY_CAST(trim(s) AS DOUBLE) AS d
        FROM t""").fetchall())
    assert got == want


@given(data=tables, n=st.integers(1, 10))
@SLOW
def test_order_desc_mixed_matches_duckdb(eng, spark, data, n):
    """Mixed-direction ORDER with nulls: Pig sorts nulls as the smallest
    value — first under ASC, LAST under DESC (desc_nulls_last)."""
    sdf, con = mk(spark, data)
    rel = (eng.from_df(sdf)
           .foreach(col("v").alias("v"), col("s").alias("s"),
                    col("k").alias("k"))
           .order_by((col("v"), False), col("s"), (col("k"), False))
           .limit(n))
    got = [tuple("∅" if x is None else x for x in r) for r in rel.collect()]
    want = [tuple("∅" if x is None else x for x in r) for r in con.sql(
        f"""SELECT v, s, k FROM t
            ORDER BY v DESC NULLS LAST, s NULLS FIRST, k DESC NULLS LAST
            LIMIT {n}""").fetchall()]
    assert got == want


@given(data=tables)
@SLOW
def test_flatten_map_matches_duckdb(eng, spark, data):
    """FLATTEN(map) → key/value rows (Pig 0.17 semantics)."""
    from spork_spark import flatten, lit
    sdf, con = mk(spark, data)
    rel = (eng.from_df(sdf)
           .foreach(col("k").alias("k"),
                    flatten(fn("TOMAP", lit("x"), col("k"),
                               lit("y"), col("v")))))
    got = norm(tuple(r) for r in rel.collect())
    want = norm(con.sql("""
        SELECT k, 'x' AS key, CAST(k AS DOUBLE) AS value FROM t
        UNION ALL
        SELECT k, 'y' AS key, v AS value FROM t""").fetchall())
    assert got == want


@given(data=tables)
@SLOW
def test_group_by_expression_key_matches_duckdb(eng, spark, data):
    """Computed group keys (GROUP BY expr): null-producing expressions
    group their nulls together."""
    sdf, con = mk(spark, data)
    rel = (eng.from_df(sdf, alias="x")
           .group_by((col("k") % 3).alias("km"))
           .foreach(col("group").alias("km"),
                    fn("COUNT_STAR").alias("n"),
                    fn("SUM", col("x").get("v")).alias("sv")))
    got = norm(tuple(r) for r in rel.collect())
    want = norm(con.sql("""
        SELECT k % 3 AS km, COUNT(*) AS n, SUM(v) AS sv
        FROM t GROUP BY 1""").fetchall())
    assert got == want


@given(data=tables)
@SLOW
def test_inner_distinct_count_matches_duckdb(eng, spark, data):
    """Nested FOREACH { DISTINCT bag.field; COUNT } — the Pig
    count-distinct idiom through the script path, fused to
    count_distinct (no bag materialization)."""
    from spork_spark.parser import run_script
    sdf, con = mk(spark, data)
    t = eng.from_df(sdf, alias="fd")
    rels = run_script(eng, """
        g = FOREACH (GROUP fd BY k) {
            ss = DISTINCT fd.s;
            GENERATE group AS k, COUNT(ss) AS nd, COUNT_STAR(fd) AS n; };
    """, relations={"fd": t})
    got = norm(tuple(r) for r in rels["g"].df().collect())
    want = norm(con.sql("""
        SELECT k, COUNT(DISTINCT s) AS nd, COUNT(*) AS n
        FROM t GROUP BY k""").fetchall())
    assert got == want


@given(data=tables, data2=tables)
@SLOW
def test_join_group_qualified_matches_duckdb(eng, spark, data, data2):
    """JOIN → GROUP on a qualified key (a::k) → aggregates over qualified
    bag fields: the disambiguation + fusion composition."""
    from spork_spark.parser import run_script
    sdf, con = mk(spark, data)
    sdf2 = spark.createDataFrame(data2, "k int, v double, s string")
    con.register("t2", pd.DataFrame(data2, columns=["k", "v", "s"]))
    a = eng.from_df(sdf, alias="qa")
    b = eng.from_df(sdf2, alias="qb")
    rels = run_script(eng, """
        j = JOIN qa BY k, qb BY k;
        g = GROUP j BY qa::k;
        f = FOREACH g GENERATE group AS k, COUNT_STAR(j) AS n,
                                SUM(j.qa::v) AS sva, SUM(j.qb::v) AS svb;
    """, relations={"qa": a, "qb": b})
    got = norm(tuple(r) for r in rels["f"].df().collect())
    want = norm(con.sql("""
        SELECT a.k, COUNT(*) AS n, SUM(a.v) AS sva, SUM(b.v) AS svb
        FROM t a JOIN t2 b ON a.k = b.k GROUP BY a.k""").fetchall())
    assert got == want


# -- script-level fuzz: full parser→compiler path ---------------------------
# (VERDICT r2 item 5: the parser seam found 3 real bugs in round 2 — keep
# fuzzing it with whole scripts, not builder calls.)

from spork_spark.parser import run_script

kv = st.lists(st.tuples(st.one_of(st.none(), st.integers(0, 4)),
                        st.one_of(st.none(), st.integers(-5, 5).map(float))),
              min_size=1, max_size=12)
outer_how = st.sampled_from(["", "LEFT", "RIGHT", "FULL"])


def mk3(spark, da, db, dc=None):
    a = spark.createDataFrame(da, "k int, v double")
    b = spark.createDataFrame(db, "k int, w double")
    con = duckdb.connect()
    con.register("a", pd.DataFrame(da, columns=["k", "v"]))
    con.register("b", pd.DataFrame(db, columns=["k", "w"]))
    dfs = {"a": a, "b": b}
    if dc is not None:
        dfs["c"] = spark.createDataFrame(dc, "k int, u double")
        con.register("c", pd.DataFrame(dc, columns=["k", "u"]))
    return dfs, con


@given(da=kv, db=kv, dc=kv, h1=outer_how, h2=outer_how)
@SLOW
def test_script_chained_mixed_outer_joins_match_duckdb(eng, spark, da, db,
                                                       dc, h1, h2):
    """3-way left-deep JOIN chains with every inner/LEFT/RIGHT/FULL combo,
    through the parser: qualified a::k keys, null keys never matching,
    null-extension interactions between the two joins."""
    dfs, con = mk3(spark, da, db, dc)
    rels = run_script(eng, f"""
        j1 = JOIN a BY k {h1 + ' OUTER' if h1 else ''}, b BY k;
        j2 = JOIN j1 BY a::k {h2 + ' OUTER' if h2 else ''}, c BY k;
        out = FOREACH j2 GENERATE a::k AS ak, v, b::k AS bk, w, k AS ck, u;
    """, relations={nm: eng.from_df(df, alias=nm)
                    for nm, df in dfs.items()})
    got = norm(tuple(r) for r in rels["out"].collect())
    want = norm(con.sql(f"""
        SELECT a.k AS ak, v, b.k AS bk, w, c.k AS ck, u
        FROM a {h1 or 'INNER'} JOIN b ON a.k = b.k
               {h2 or 'INNER'} JOIN c ON a.k = c.k""").fetchall())
    assert got == want


@given(data=kv, c=threshold)
@SLOW
def test_script_nested_distinct_filter_combo_matches_duckdb(eng, spark,
                                                            data, c):
    """Nested FOREACH combining inner DISTINCT, FILTER, and DISTINCT-of-
    FILTER (PigMix L4/L15 idiom under fuzz) vs DuckDB FILTER/DISTINCT
    aggregates."""
    dfs, con = mk3(spark, data, [(0, 0.0)])
    rels = run_script(eng, f"""
        g = GROUP a BY k;
        out = FOREACH g {{ d = DISTINCT a.v;
                           f = FILTER a BY v > {c}.0;
                           fd = DISTINCT f.v;
                           GENERATE group AS k, COUNT(d) AS nd,
                                    COUNT(fd) AS nfd, SUM(f.v) AS sf,
                                    COUNT_STAR(a) AS n; }};
    """, relations={"a": eng.from_df(dfs["a"], alias="a")})
    got = norm(tuple(r) for r in rels["out"].collect())
    want = norm(con.sql(f"""
        SELECT k, COUNT(DISTINCT v) AS nd,
               COUNT(DISTINCT v) FILTER (WHERE v > {c}) AS nfd,
               SUM(v) FILTER (WHERE v > {c}) AS sf,
               COUNT(*) AS n
        FROM a GROUP BY k""").fetchall())
    assert got == want


@given(da=kv, db=kv)
@SLOW
def test_script_cogroup_inner_cross_matches_duckdb(eng, spark, da, db):
    """COGROUP + inner CROSS of the two cogrouped bags: per-key cartesian
    cardinality must equal the product of per-key counts (null keys
    cogroup together — null-safe oracle join)."""
    dfs, con = mk3(spark, da, db)
    rels = run_script(eng, """
        cg = COGROUP a BY k, b BY k;
        out = FOREACH cg { x = CROSS a, b;
                           GENERATE group AS k, COUNT_STAR(x) AS n,
                                    COUNT_STAR(a) AS na,
                                    COUNT_STAR(b) AS nb; };
    """, relations={nm: eng.from_df(df, alias=nm)
                    for nm, df in dfs.items()})
    got = norm(tuple(r) for r in rels["out"].collect())
    want = norm(con.sql("""
        WITH ga AS (SELECT k, COUNT(*) AS n FROM a GROUP BY k),
             gb AS (SELECT k, COUNT(*) AS n FROM b GROUP BY k)
        SELECT COALESCE(ga.k, gb.k) AS k,
               COALESCE(ga.n, 0) * COALESCE(gb.n, 0) AS n,
               COALESCE(ga.n, 0) AS na, COALESCE(gb.n, 0) AS nb
        FROM ga FULL JOIN gb ON ga.k IS NOT DISTINCT FROM gb.k""").fetchall())
    assert got == want


arrtab = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 4)),
              st.integers(-5, 5),
              st.one_of(st.none(),
                        st.lists(st.sampled_from(["x", "y", "zz", ""]),
                                 max_size=4))),
    min_size=1, max_size=10)


@given(da=arrtab, db=kv, how=st.sampled_from(["inner", "left"]))
@SLOW
def test_flatten_then_join_matches_duckdb(eng, spark, da, db, how):
    """FLATTEN-then-JOIN under fuzz: the join-before-explode deferral
    (inner joins) and the eager path (outer joins) must both equal
    DuckDB's unnest-then-join on arbitrary data incl. null keys, empty
    and null bags."""
    from spork_spark import flatten
    a = spark.createDataFrame(da, "k int, p int, bag array<string>")
    b = spark.createDataFrame(db, "k int, w double")
    con = duckdb.connect()
    con.register("a", pd.DataFrame(da, columns=["k", "p", "bag"]))
    con.register("b", pd.DataFrame(db, columns=["k", "w"]))
    fe = eng.from_df(a, alias="fa").foreach(
        col("k"), col("p"), flatten(col("bag")).alias("tok"))
    r = fe.join([col("k")], eng.from_df(b, alias="fb"), [col("k")], how=how)
    got = norm(tuple(x) for x in r.collect())
    want = norm(con.sql(f"""
        WITH fe AS (SELECT k, p, unnest(bag) AS tok FROM a)
        SELECT fe.k, p, tok, b.k, w
        FROM fe {'LEFT' if how == 'left' else 'INNER'} JOIN b
          ON fe.k = b.k""").fetchall())
    assert got == want


@given(docs=st.lists(
           st.lists(st.sampled_from(["banner", "footer", "alpha beta",
                                     "unique", "x", ""]),
                    min_size=1, max_size=5),
           min_size=1, max_size=8),
       max_occ=st.integers(1, 3))
@SLOW
def test_dedup_lines_matches_reference(eng, spark, docs, max_occ):
    """dedup_lines vs a pure-Python reference: line dropped iff it occurs
    in more than max_occ DISTINCT docs; surviving lines keep order; docs
    losing all lines come back empty."""
    from spork_spark.operators import dedup_lines
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in
           dedup_lines(sdf, max_occurrences=max_occ).collect()}

    from collections import defaultdict
    in_docs = defaultdict(set)
    for i, t in rows:
        for ln in t.split("\n"):
            in_docs[ln].add(i)
    # min_line_chars=1 (default): empty lines are never counted as
    # boilerplate, hence never removed
    want = {i: "\n".join(ln for ln in t.split("\n")
                         if len(ln) < 1 or len(in_docs[ln]) <= max_occ)
            for i, t in rows}
    assert got == want


fact_rows = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 4)),
              st.one_of(st.none(), st.integers(-9, 9).map(float)),
              st.one_of(st.none(), st.integers(-20, 20))),
    min_size=1, max_size=15)
dim_rows = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 4)),
              st.sampled_from(["g1", "g2", "g3"])),
    min_size=1, max_size=8)


@given(fact=fact_rows, dim=dim_rows)
@SLOW
def test_eager_agg_matches_duckdb(eng, spark, fact, dim):
    """Eager aggregation under fuzz: duplicate join keys on BOTH sides
    (multiplicity must scale partials exactly), null keys (never match),
    null fact values (skipped by SUM/COUNT, counted by COUNT_STAR)."""
    f = spark.createDataFrame(fact, "fk int, v double, w int")
    d = spark.createDataFrame(dim, "dk int, grp string")
    con = duckdb.connect()
    con.register("f", pd.DataFrame(fact, columns=["fk", "v", "w"]))
    con.register("d", pd.DataFrame(dim, columns=["dk", "grp"]))
    j = eng.from_df(d, alias="fd").join([col("dk")],
                                        eng.from_df(f, alias="ff"),
                                        [col("fk")])
    g = j.group_by(col("grp"))
    r = g.foreach(col("group").alias("grp"),
                  fn("SUM", col(j.alias).get("v")).alias("sv"),
                  fn("COUNT", col(j.alias).get("v")).alias("cv"),
                  fn("MIN", col(j.alias).get("v")).alias("mn"),
                  fn("MAX", col(j.alias).get("v")).alias("mx"),
                  fn("COUNT_STAR").alias("n"),
                  fn("AVG", col(j.alias).get("v")).alias("av"),
                  fn("AVG", col(j.alias).get("w")).alias("aw"))
    assert "__ea_" in r.df()._jdf.queryExecution().optimizedPlan().toString()
    got = norm(tuple(x) for x in r.collect())
    want = norm(con.sql("""
        SELECT grp, SUM(v) AS sv, COUNT(v) AS cv, MIN(v) AS mn,
               MAX(v) AS mx, COUNT(*) AS n, AVG(v) AS av,
               AVG(CAST(w AS DOUBLE)) AS aw
        FROM d JOIN f ON dk = fk GROUP BY grp""").fetchall())
    assert got == want


# ---------------------------------------------------------------- type seam

AGG_FORMS = [
    # (engine fn, engine arg, oracle SQL written with the repo's casting
    #  discipline — DuckDB SUM/COUNT over ints widen to HUGEINT, so a
    #  correct oracle casts to BIGINT; r03's one red row was this seam)
    ("COUNT", "v", "CAST(COUNT(v) AS BIGINT)"),
    ("SUM", "v", "SUM(v)"),
    ("SUM", "k", "CAST(SUM(k) AS BIGINT)"),
    ("AVG", "v", "AVG(v)"),
    ("AVG", "k", "AVG(k)"),
    ("MIN", "s", "MIN(s)"),
    ("MAX", "v", "MAX(v)"),
    ("COUNT_STAR", None, "CAST(COUNT(*) AS BIGINT)"),
]


@given(data=tables,
       picks=st.lists(st.sampled_from(range(len(AGG_FORMS))),
                      min_size=1, max_size=4, unique=True))
@SLOW
def test_aggregate_types_match_duckdb(eng, spark, data, picks):
    """Typed (Arrow-schema) agreement on generated aggregate queries —
    the driver's value-hash is type-sensitive, so new oracles must not
    reintroduce the HUGEINT class of bug (VERDICT r03 #1/#6). Uses the
    same canonical labels as tools/check_oracle.py."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.check_oracle import type_mismatches
    sdf, con = mk(spark, data)
    gens = [col("group").alias("k")]
    sqls = []
    for i, idx in enumerate(picks):
        fname, arg, dsql = AGG_FORMS[idx]
        alias = f"a{i}"
        if arg is None:
            gens.append(fn("COUNT_STAR").alias(alias))
        else:
            gens.append(fn(fname, col("x").get(arg)).alias(alias))
        sqls.append(f"{dsql} AS {alias}")
    rel = eng.from_df(sdf, alias="x").group_by(col("k")).foreach(*gens)
    arrow_schema = con.sql(
        "SELECT k, " + ", ".join(sqls) + " FROM t GROUP BY k").arrow().schema
    assert type_mismatches(rel.df().schema, arrow_schema) == []


# ------------------------------------------------- classifier hash seam

words = st.lists(st.sampled_from(["a", "b", "ab", "The", "x9", "Zz", "!"]),
                 min_size=0, max_size=12)


@given(texts=st.lists(words, min_size=1, max_size=8))
@SLOW
def test_classifier_score_matches_duckdb(eng, spark, texts):
    """classifier_score (hashed-bigram integer-weight scorer) vs the same
    pipeline in DuckDB SQL — guards the md5-bucket arithmetic seam
    (hex-prefix → int) and the n-gram multiplicity contract on random
    short texts including empties and punctuation."""
    from spork_spark.operators import classifier_score
    rows = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["score_int"], r["keep"])
           for r in classifier_score(sdf).collect()}
    con = duckdb.connect()
    con.register("d", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {r[0]: (r[1], r[2], r[3]) for r in con.sql(r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> x != '') AS ws
          FROM d),
        g AS (
          SELECT doc_id,
                 CASE WHEN len(ws) >= 2
                      THEN list_transform(range(1, len(ws)),
                            i -> ws[CAST(i AS INT)] || ' '
                                 || ws[CAST(i AS INT) + 1])
                      ELSE CAST([] AS VARCHAR[]) END AS grams
          FROM t),
        w AS (
          SELECT doc_id, grams,
                 list_transform(grams, g2 ->
                   CAST(list_sum(list_transform([1, 2, 3, 4], i ->
                     (ascii(substring(md5(g2), CAST(i AS INT), 1))
                      - CASE WHEN ascii(substring(md5(g2),
                                        CAST(i AS INT), 1)) < 58
                             THEN 48 ELSE 87 END)
                     * CASE i WHEN 1 THEN 4096 WHEN 2 THEN 256
                              WHEN 3 THEN 16 ELSE 1 END))
                    AS BIGINT) % 997 - 498) AS wts
          FROM g)
        SELECT doc_id, CAST(len(grams) AS INT),
               CAST(COALESCE(list_sum(wts), 0) AS BIGINT),
               COALESCE(list_sum(wts), 0) > 0
        FROM w""").fetchall()}
    assert got == want


# -------------------------------------------------- time_rollup cascade

_ts_rows = st.lists(
    st.tuples(st.integers(0, 3 * 86400 * 1000),          # ms within 3 days
              st.sampled_from(["a", "b"]),
              st.floats(-1000, 1000, allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=60)


@given(rows=_ts_rows)
@SLOW
def test_time_rollup_matches_duckdb(spark, rows):
    """Random event sets: the hour→day cascade must equal DuckDB's direct
    per-grain aggregation (exact decimal sums; count/min/max)."""
    import datetime as dt
    from spork_spark.operators import time_rollup
    base = dt.datetime(2024, 1, 1)
    data = [(base + dt.timedelta(milliseconds=ms), et,
             round(v, 2)) for ms, et, v in rows]
    sdf = spark.createDataFrame(data, "ts timestamp_ntz, et string, v double")
    got = norm(tuple(r) for r in
               time_rollup(sdf, ts_col="ts", dims=("et",), value_col="v",
                           grains=("hour", "day")).collect())
    pdf = pd.DataFrame(data, columns=["ts", "et", "v"])
    con = duckdb.connect()
    con.register("ev", pdf)
    want = norm(con.sql("""
        WITH base AS (
          SELECT date_trunc('hour', ts) AS bucket, et,
                 COUNT(*) AS cnt,
                 CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DECIMAL(38,2))
                     AS sum_value,
                 MIN(v) AS min_value, MAX(v) AS max_value
          FROM ev GROUP BY 1, 2)
        SELECT 'hour' AS grain, * FROM base
        UNION ALL
        SELECT 'day', date_trunc('day', bucket), et,
               CAST(SUM(cnt) AS BIGINT),
               CAST(SUM(sum_value) AS DECIMAL(38,2)),
               MIN(min_value), MAX(max_value)
        FROM base GROUP BY 2, 3
    """).fetchall())
    assert got == want


# --- round-5 algebraic-operator properties -------------------------------

ev_row = st.tuples(
    st.integers(0, 4),                       # user
    st.integers(0, 10_000),                  # seconds offset
    st.integers(-100, 100).map(float),       # value
)
ev_tables = st.lists(ev_row, min_size=1, max_size=40)


def mk_events(spark, rows):
    import datetime
    base = datetime.datetime(2024, 1, 1)
    data = [(u, base + datetime.timedelta(seconds=s), v, i)
            for i, (u, s, v) in enumerate(rows)]
    return spark.createDataFrame(
        data, "u bigint, ts timestamp_ntz, value double, eid bigint")


@given(data=ev_tables, cut=st.integers(0, 10_000),
       grains=st.sampled_from([("hour",), ("hour", "day"),
                               ("minute", "hour", "day")]))
@SLOW
def test_rollup_merge_equals_direct_property(spark, data, cut, grains):
    """For ANY split point and grain set, rollup(before) ⊕ rollup(after)
    must equal rollup(all) exactly — the decomposability contract that
    makes continuous-aggregate refresh sound."""
    import datetime
    from pyspark.sql import functions as F
    from spork_spark.operators import rollup_merge, time_rollup
    df = mk_events(spark, data).withColumn("event_type", F.lit("t"))
    cutoff = datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=cut)
    merged = rollup_merge(
        time_rollup(df.filter(F.col("ts") < F.lit(cutoff)), grains=grains),
        time_rollup(df.filter(F.col("ts") >= F.lit(cutoff)), grains=grains))
    direct = time_rollup(df, grains=grains)
    k = lambda r: (r["grain"], r["bucket"], r["event_type"])
    got = {k(r): (r["cnt"], r["sum_value"], r["min_value"], r["max_value"])
           for r in merged.collect()}
    want = {k(r): (r["cnt"], r["sum_value"], r["min_value"], r["max_value"])
            for r in direct.collect()}
    assert got == want


@given(data=ev_tables, gap=st.integers(1, 5_000))
@SLOW
def test_sessionize_gap_invariants_property(spark, data, gap):
    """For ANY event set and gap: consecutive events of a session are
    within gap; session boundaries exceed it; ordinals are dense from 1
    — checked against an independent driver-side replay."""
    from spork_spark.operators import sessionize
    df = mk_events(spark, data)
    out = sessionize(df, "u", "ts", gap_seconds=gap,
                     tiebreak_col="eid").collect()
    by_user = {}
    for r in sorted(out, key=lambda r: (r["u"], r["ts"], r["eid"])):
        by_user.setdefault(r["u"], []).append(r)
    for rows_ in by_user.values():
        prev = None
        expect = 1
        for r in rows_:
            if prev is not None:
                delta = (r["ts"] - prev["ts"]).total_seconds()
                if delta > gap:
                    expect += 1
                assert (delta > gap) == (r["session_seq"] > prev["session_seq"])
            assert r["session_seq"] == expect
            prev = r
