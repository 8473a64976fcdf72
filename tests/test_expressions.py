"""Expression-language semantics (SURVEY.md §1.4, §2.2): the Pig-vs-Spark
divergences the compiler must own — int division, anchored matches,
null-on-failure casts, bincond, null comparisons."""

from spork_spark import col, lit, fn, bincond


def rows(rel):
    return [tuple(r) for r in rel.df().collect()]


def test_int_division_truncates_toward_zero(eng, spark):
    df = spark.createDataFrame([(7, 2), (-7, 2), (7, -2), (1, 0)],
                               "a int, b int")
    out = rows(eng.from_df(df).foreach((col("a") / col("b")).alias("q")))
    assert out == [(3,), (-3,), (-3,), (None,)]   # Java semantics; /0 → null


def test_long_division_returns_long(eng, spark):
    df = spark.createDataFrame([(10, 4)], "a bigint, b int")
    rel = eng.from_df(df).foreach((col("a") / col("b")).alias("q"))
    assert dict(rel.df().dtypes)["q"] == "bigint"
    assert rows(rel) == [(2,)]


def test_double_division_stays_double(eng, spark):
    df = spark.createDataFrame([(7.0, 2)], "a double, b int")
    assert rows(eng.from_df(df).foreach((col("a") / col("b")).alias("q"))) \
        == [(3.5,)]


def test_mod_keeps_dividend_sign(eng, spark):
    df = spark.createDataFrame([(7, 3), (-7, 3)], "a int, b int")
    assert rows(eng.from_df(df).foreach((col("a") % col("b")).alias("m"))) \
        == [(1,), (-1,)]


def test_matches_is_full_string(eng, spark):
    df = spark.createDataFrame([("abc",), ("xabc",), ("abcx",)], "s string")
    out = rows(eng.from_df(df).filter(col("s").matches("abc")))
    assert out == [("abc",)]          # Java String.matches, not find()


def test_matches_with_wildcards(eng, spark):
    df = spark.createDataFrame([("3-MEDIUM",), ("MEDIUM-3",)], "s string")
    assert rows(eng.from_df(df).filter(col("s").matches("3-.*"))) \
        == [("3-MEDIUM",)]


def test_cast_failure_yields_null(eng, spark):
    df = spark.createDataFrame([("12",), ("x",), (None,)], "s string")
    assert rows(eng.from_df(df).foreach(col("s").cast("int").alias("i"))) \
        == [(12,), (None,), (None,)]


def test_cast_pig_type_names(eng, spark):
    df = spark.createDataFrame([(1,)], "a int")
    rel = eng.from_df(df).foreach(
        col("a").cast("long").alias("l"),
        col("a").cast("chararray").alias("s"),
        col("a").cast("double").alias("d"))
    assert dict(rel.df().dtypes) == {"l": "bigint", "s": "string",
                                     "d": "double"}


def test_bincond_and_null_predicate(eng, spark):
    df = spark.createDataFrame([(1,), (10,), (None,)], "a int")
    out = rows(eng.from_df(df).foreach(
        bincond(col("a") > 5, "big", "small").alias("b")))
    # null predicate → otherwise branch in Spark when() semantics
    assert out == [("small",), ("big",), ("small",)]


def test_filter_null_predicate_drops_row(eng, spark):
    df = spark.createDataFrame([(1,), (10,), (None,)], "a int")
    assert rows(eng.from_df(df).filter(col("a") > 5)) == [(10,)]


def test_is_null_and_comparison_with_null(eng, spark):
    df = spark.createDataFrame([(1,), (None,)], "a int")
    out = rows(eng.from_df(df).foreach(
        col("a").is_null().alias("isn"),
        (col("a") == 1).alias("eq")))
    assert out == [(False, True), (True, None)]


def test_in_list(eng, spark):
    df = spark.createDataFrame([("F",), ("P",), ("O",)], "s string")
    assert rows(eng.from_df(df).filter(col("s").isin("F", "P"))) \
        == [("F",), ("P",)]


def test_map_lookup(eng, spark):
    df = spark.createDataFrame([({"a": 1, "b": 2},)], "m map<string,int>")
    assert rows(eng.from_df(df).foreach(col("m").lookup("a").alias("v"),
                                        col("m").lookup("zz").alias("miss"))) \
        == [(1, None)]


def test_positional_reference(eng, spark):
    df = spark.createDataFrame([("x", 1)], "name string, n int")
    from spork_spark import pos
    assert rows(eng.from_df(df).foreach(pos(1).alias("second"))) == [(1,)]


def test_tuple_deref(eng, spark):
    df = spark.createDataFrame([((1, "a"),)], "t struct<x:int,y:string>")
    assert rows(eng.from_df(df).foreach(col("t").get("y").alias("y"))) \
        == [("a",)]


def test_division_by_zero_null_all_types(eng, spark):
    """x/0 -> null for int AND double (SQL semantics, matches the DuckDB
    oracle; divergence from Java-Pig's double Infinity is documented)."""
    from spork_spark import col
    src = spark.createDataFrame([(1.0, 0.0, 1, 0)],
                                "a double, b double, x int, y int")
    r = eng.from_df(src).foreach((col("a") / col("b")).alias("dd"),
                                 (col("x") / col("y")).alias("ii"),
                                 (col("a") % col("b")).alias("dm"))
    assert [tuple(x) for x in r.df().collect()] == [(None, None, None)]


def test_window_frame_rows_between(eng, spark):
    from spork_spark.plans import expressions as E
    from spork_spark import col
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0)],
        "k int, i int, v double")
    run = E.WindowFunc("sum", [col("v")], [col("k")], [(col("i"), True)],
                       frame=("rows", None, 0))
    mov = E.WindowFunc("sum", [col("v")], [col("k")], [(col("i"), True)],
                       frame=("rows", -1, 0))
    out = (eng.from_df(df).foreach(col("k").alias("k"), col("i").alias("i"),
                                   E.Aliased(run, "run"),
                                   E.Aliased(mov, "mov"))
              .order_by(col("k"), col("i")).df().collect())
    assert [(r.run, r.mov) for r in out] == \
        [(10.0, 10.0), (30.0, 30.0), (60.0, 50.0), (5.0, 5.0)]
