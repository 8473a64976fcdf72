"""Nested FOREACH (SURVEY.md §2.3): inner FILTER/ORDER/LIMIT/DISTINCT/
FOREACH over the bag via higher-order functions; bag-mode aggregates
(Pig aggregates are EvalFuncs over bags); applyInPandas escape hatch."""

import pytest

from spork_spark import col, fn, lam, lit


@pytest.fixture(scope="module")
def grouped(eng, spark):
    """orders-shaped: (cust, price) grouped by cust → (group, bag)."""
    rows = [("a", 10.0), ("a", 20.0), ("a", 30.0),
            ("b", 5.0), ("b", None), ("c", 100.0)]
    df = spark.createDataFrame(rows, "cust string, price double")
    return eng.from_df(df, alias="o")


def test_inner_filter_then_count(grouped):
    """FOREACH g { big = FILTER o BY price > 12; GENERATE group, COUNT(big) }"""
    r = (grouped.group_by(col("cust"))
         .foreach(col("group").alias("cust"),
                  fn("COUNT",
                     fn("FILTER_BAG", col("o"),
                        lam(lambda t: t.get("price") > 12.0)))
                  .alias("n_big")))
    out = {r2["cust"]: r2["n_big"] for r2 in r.df().collect()}
    assert out == {"a": 2, "b": 0, "c": 1}


def test_inner_order_limit_sum(grouped):
    """FOREACH g { s = ORDER o BY price DESC; t2 = LIMIT s 2;
    GENERATE group, SUM(t2.price) } — top-2 sum per group."""
    r = (grouped.group_by(col("cust"))
         .foreach(col("group").alias("cust"),
                  fn("SUM",
                     fn("LIMIT_BAG",
                        fn("SORT_BAG", col("o"), "price", False),
                        2).get("price"))
                  .alias("top2")))
    out = {x["cust"]: x["top2"] for x in r.df().collect()}
    assert out == {"a": 50.0, "b": 5.0, "c": 100.0}


def test_inner_distinct_count(eng, spark):
    df = spark.createDataFrame([("a", 1), ("a", 1), ("a", 2)],
                               "k string, v int")
    r = (eng.from_df(df, alias="x").group_by(col("k"))
         .foreach(col("group").alias("k"),
                  fn("COUNT_STAR",
                     fn("DISTINCT_BAG",
                        fn("TRANSFORM_BAG", col("x"),
                           lam(lambda t: t.get("v")))))
                  .alias("n_distinct")))
    assert r.df().collect()[0]["n_distinct"] == 2


def test_top_builtin(grouped):
    """TOP(n, field, bag) → bag of top-n tuples by field."""
    r = (grouped.group_by(col("cust"))
         .foreach(col("group").alias("cust"),
                  fn("TOP", 2, "price", col("o")).alias("top")))
    out = {x["cust"]: sorted(t["price"] for t in x["top"] if t["price"]
                             is not None)
           for x in r.df().collect()}
    assert out["a"] == [20.0, 30.0]


def test_bag_mode_aggregate_semantics(grouped):
    """COUNT skips nulls; SUM/AVG/MIN/MAX over bags; empty bag → null."""
    r = (grouped.group_by(col("cust"))
         .foreach(col("group").alias("cust"),
                  fn("COUNT", col("o").get("price")).alias("cnt"),
                  fn("MIN", col("o").get("price")).alias("mn")))
    # fused path (groupBy agg) — sanity
    out = {x["cust"]: (x["cnt"], x["mn"]) for x in r.df().collect()}
    assert out["b"] == (1, 5.0)

    # unfused path: bag materialized because it also escapes whole
    r2 = (grouped.group_by(col("cust"))
          .foreach(col("group").alias("cust"),
                   fn("COUNT", col("o").get("price")).alias("cnt"),
                   fn("SUM", col("o").get("price")).alias("sm"),
                   fn("AVG",
                      fn("FILTER_BAG", col("o"),
                         lam(lambda t: t.get("price").is_not_null()))
                      .get("price")).alias("av"),
                   col("o").alias("bag")))
    got = {x["cust"]: (x["cnt"], x["sm"], x["av"], len(x["bag"]))
           for x in r2.df().collect()}
    assert got["a"] == (3, 60.0, 20.0, 3)
    assert got["b"][0] == 1 and got["b"][1] == 5.0 and got["b"][3] == 2


def test_apply_per_group_escape_hatch(eng, spark):
    """Arbitrary inner plan via applyInPandas (SURVEY.md §2.3 path 3)."""
    df = spark.createDataFrame([("a", 1.0), ("a", 3.0), ("b", 5.0)],
                               "k string, v double")

    def spread(pdf):
        import pandas as pd
        return pd.DataFrame({"k": [pdf["k"].iloc[0]],
                             "spread": [pdf["v"].max() - pdf["v"].min()]})

    r = eng.from_df(df).apply_per_group([col("k")], spread,
                                        "k string, spread double")
    out = {x["k"]: x["spread"] for x in r.df().collect()}
    assert out == {"a": 2.0, "b": 0.0}


def test_inner_cross_via_script(eng):
    """Inner CROSS (Pig 0.13+): per-group cartesian of two inner bags,
    parsed from script and compiled to nested transform+flatten."""
    from spork_spark.parser import run_script

    rels = run_script(eng, """
        o = LOAD '/root/testdata/sf0.001/orders.parquet';
        g = GROUP o BY o_orderpriority;
        x = FOREACH g { a = FILTER o BY o_totalprice > 250000.0;
                        b = FILTER o BY o_totalprice < 5000.0;
                        c = CROSS a, b;
                        GENERATE group AS pri, COUNT_STAR(c) AS n; };
    """)
    import duckdb
    exp = {r[0]: r[1] for r in duckdb.sql("""
        SELECT o_orderpriority,
               COUNT(CASE WHEN o_totalprice > 250000.0 THEN 1 END)
               * COUNT(CASE WHEN o_totalprice < 5000.0 THEN 1 END)
        FROM '/root/testdata/sf0.001/orders.parquet' GROUP BY 1""").fetchall()}
    got = {r["pri"]: r["n"] for r in rels["x"].df().collect()}
    assert got == exp


def test_inner_cross_field_collision_disambiguates(eng):
    """CROSS of bags sharing field names → Pig's alias::field naming."""
    from spork_spark.parser import run_script

    rels = run_script(eng, """
        o = LOAD '/root/testdata/sf0.001/orders.parquet';
        g = GROUP o BY o_orderpriority;
        z = FOREACH g { a = ORDER o BY o_totalprice DESC; a = LIMIT a 2;
                        b = ORDER o BY o_totalprice ASC;  b = LIMIT b 2;
                        c = CROSS a, b;
                        GENERATE group AS pri, c; };
    """)
    row = rels["z"].df().collect()[0]
    assert len(row["c"]) == 4
    names = row["c"][0].asDict().keys()
    assert "a::o_totalprice" in names and "b::o_totalprice" in names


def test_inner_foreach_projection_and_agg(eng):
    """Inner FOREACH computes per-tuple expressions; downstream inner ops
    and bag-mode aggregates see the projected bag."""
    from spork_spark.parser import run_script

    rels = run_script(eng, """
        li = LOAD '/root/testdata/sf0.001/lineitem.parquet';
        g = GROUP li BY l_returnflag;
        y = FOREACH g { p = FOREACH li GENERATE l_quantity,
                                l_extendedprice * 0.5 AS half;
                        q = FILTER p BY half > 20000.0;
                        GENERATE group AS flag, COUNT(q) AS n,
                                 SUM(p.l_quantity) AS qty; };
    """)
    import duckdb
    exp = {r[0]: (r[1], r[2]) for r in duckdb.sql("""
        SELECT l_returnflag,
               COUNT(CASE WHEN l_extendedprice * 0.5 > 20000.0 THEN 1 END),
               SUM(l_quantity)
        FROM '/root/testdata/sf0.001/lineitem.parquet' GROUP BY 1""").fetchall()}
    got = {r["flag"]: (r["n"], r["qty"]) for r in rels["y"].df().collect()}
    for k, (n, qty) in exp.items():
        assert got[k][0] == n and abs(got[k][1] - qty) < 1e-6


def test_decimal_bag_sum_is_exact(eng, spark, tmp_path):
    """SUM over a bag of decimals folds in DECIMAL, not double — exact,
    order-independent addition (an sf0.1 sweep caught a double fold
    landing on a floor(x*100+0.5) rounding boundary with
    engine-dependent last ulps). (37,s)+(37,s) → (38,s) keeps every
    fold step exact."""
    from decimal import Decimal

    from spork_spark.parser import run_script
    rows = [(1, 0.1), (1, 0.2), (1, 0.3), (2, 1e-3)] * 5
    df = spark.createDataFrame(rows, "k int, v double")
    p = str(tmp_path / "dec_in")
    df.write.parquet(p)
    rels = run_script(eng, f"""
        t = LOAD '{p}';
        g = GROUP t BY k;
        s = FOREACH g {{ d = FOREACH t GENERATE (bigdecimal)v AS dv;
                         GENERATE group AS k, SUM(d.dv) AS total; }};
    """)
    out = {r["k"]: r["total"] for r in rels["s"].df().collect()}
    # Spark double→decimal casts via the SHORTEST decimal repr
    # (BigDecimal.valueOf semantics): 0.1 → 0.1 exactly, not the
    # binary expansion 0.1000…0555…
    assert out[1] == sum(Decimal(str(x)) for x in (0.1, 0.2, 0.3)) * 5
    assert out[2] == Decimal(str(1e-3)) * 5


def test_decimal38_scale38_bag_sum_does_not_crash(eng, spark, tmp_path):
    """decimal(38,38) elements cannot form a valid (37,38) accumulator;
    the fold must fall back to double instead of raising
    'scale cannot be greater than precision' (round-4 review finding).
    Elements with 38 significant digits NULL the exact fold — the same
    null-on-overflow contract as Spark's native decimal SUM."""
    from decimal import Decimal

    from spork_spark.parser import run_script
    df = spark.createDataFrame(
        [(1, Decimal("0.1")), (1, Decimal("0.25"))],
        "k int, v decimal(38,38)")
    p = str(tmp_path / "dec38_in")
    df.write.parquet(p)
    rels = run_script(eng, f"""
        t = LOAD '{p}';
        g = GROUP t BY k;
        s = FOREACH g {{ d = FILTER t BY v IS NOT NULL;
                         GENERATE group AS k, SUM(d.v) AS total; }};
    """)
    out = rels["s"].df().collect()     # pre-fix: ParseException here
    assert abs(float(out[0]["total"]) - 0.35) < 1e-12


def test_decimal38_precision_boundary(eng, spark, tmp_path):
    """Documented contract for precision-38 bags (round-4 advice item),
    on the true BAG-FOLD path (inner ORDER defeats the §4.3 fusion —
    fuseable shapes like inner FILTER compile to the NATIVE decimal sum
    and have no boundary at all): values fitting 37 digits fold
    EXACTLY; a value that genuinely needs 38 significant digits nulls
    the sum (earlier than native decimal SUM — the price of the
    order-independent exact fold)."""
    from decimal import Decimal

    from spork_spark.parser import run_script
    fits = Decimal(10) ** 36         # 37 digits — lossless (37,0) cast
    needs38 = Decimal(10) ** 37      # 38 digits — overflows accumulator
    df = spark.createDataFrame(
        [(1, fits), (1, fits * 2), (2, needs38), (2, Decimal(1))],
        "k int, v decimal(38,0)")
    p = str(tmp_path / "dec38p_in")
    df.write.parquet(p)
    rels = run_script(eng, f"""
        t = LOAD '{p}';
        g = GROUP t BY k;
        s = FOREACH g {{ d = ORDER t BY v;
                         GENERATE group AS k, SUM(d.v) AS total; }};
    """)
    out = {r["k"]: r["total"] for r in rels["s"].df().collect()}
    assert out[1] == fits * 3                  # exact, no double round
    assert out[2] is None                      # documented null-early
    # the fuseable shape (inner FILTER) takes the native sum: exact
    rels2 = run_script(eng, f"""
        t = LOAD '{p}';
        g = GROUP t BY k;
        s = FOREACH g {{ d = FILTER t BY v IS NOT NULL;
                         GENERATE group AS k, SUM(d.v) AS total; }};
    """)
    out2 = {r["k"]: r["total"] for r in rels2["s"].df().collect()}
    assert int(out2[2]) == 10 ** 37 + 1   # python Decimal ctx rounds
