"""UDF surface (SURVEY.md §2.10): registration, @output_schema annotation,
vectorized pandas UDFs, UDTF-alike (bag-returning UDF + FLATTEN)."""

from spork_spark import Engine, col, flatten, fn
from spork_spark.functions.udf import output_schema, pig_schema_to_ddl


def test_pig_schema_to_ddl():
    assert pig_schema_to_ddl("x:int") == "int"
    assert pig_schema_to_ddl("chararray") == "string"
    assert pig_schema_to_ddl("t:(a:int,b:chararray)") == \
        "struct<a:int,b:string>"
    assert pig_schema_to_ddl("b:bag{t:(v:int)}") == "array<struct<v:int>>"


def test_register_plain_udf(spark):
    eng = Engine(spark)
    eng.register_udf("REV", lambda s: s[::-1] if s else None, "string")
    df = spark.createDataFrame([("abc",), (None,)], "s string")
    out = [r[0] for r in
           eng.from_df(df).foreach(fn("REV", col("s")).alias("r"))
              .df().collect()]
    assert out == ["cba", None]


def test_output_schema_annotation(spark):
    eng = Engine(spark)

    @output_schema("n:long")
    def strlen(s):
        return len(s) if s is not None else None

    eng.register_udf("STRLEN", strlen)
    df = spark.createDataFrame([("hello",)], "s string")
    rel = eng.from_df(df).foreach(fn("STRLEN", col("s")).alias("n"))
    assert dict(rel.df().dtypes)["n"] == "bigint"
    assert rel.df().collect()[0][0] == 5


def test_vectorized_pandas_udf(spark):
    eng = Engine(spark)

    def double_it(v):
        return v * 2.0

    eng.register_udf("DBL", double_it, "double", vectorized=True)
    df = spark.createDataFrame([(1.5,), (2.0,)], "v double")
    out = [r[0] for r in
           eng.from_df(df).foreach(fn("DBL", col("v")).alias("d"))
              .df().collect()]
    assert out == [3.0, 4.0]


def test_udtf_bag_returning_plus_flatten(spark):
    """EvalFunc returning a bag + FLATTEN = 1→N rows (SURVEY.md §2.10)."""
    eng = Engine(spark)

    @output_schema("b:bag{t:(part:chararray)}")
    def split_csv(s):
        return [(p,) for p in s.split(",")] if s else []

    eng.register_udf("SPLIT_CSV", split_csv)
    df = spark.createDataFrame([(1, "a,b"), (2, "")], "k int, s string")
    out = (eng.from_df(df)
           .foreach(col("k").alias("k"),
                    flatten(fn("SPLIT_CSV", col("s")))))
    rows = [tuple(r) for r in out.df().collect()]
    assert rows == [(1, "a"), (1, "b")]      # empty bag drops row 2


def test_register_udaf_grouped_agg(eng, spark):
    """Custom aggregate (Algebraic/Accumulator analog, SURVEY.md §2.10):
    a grouped-agg pandas UDF participates in the fused groupBy().agg()
    path — values stream through Arrow, no bag materialization."""
    from spork_spark import col, fn

    def trimmed_mean(s):
        import numpy as np
        a = np.sort(s.to_numpy())
        return float(a[1:-1].mean()) if len(a) > 2 else float(a.mean())

    eng.register_udaf("TRIMMED_MEAN", trimmed_mean, "double")
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 100.0), ("a", 2.0), ("a", 3.0), ("b", 7.0)],
        "k string, v double")
    r = (eng.from_df(df, alias="x").group_by(col("k"))
         .foreach(col("group").alias("k"),
                  fn("TRIMMED_MEAN", col("x").get("v")).alias("tm"),
                  fn("COUNT_STAR").alias("n")))
    plan = r.df()._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    out = {row["k"]: (row["tm"], row["n"]) for row in r.df().collect()}
    assert out["a"] == (2.5, 4) and out["b"] == (7.0, 1)


def test_register_python_file_with_namespace(eng, tmp_path):
    """REGISTER 'udfs.py' AS ns (the Jython scripting surface, SURVEY.md
    §2.10): @outputSchema-annotated functions become callable as ns.fn."""
    from spork_spark.parser import run_script

    udfs = tmp_path / "myudfs.py"
    udfs.write_text(
        "@outputSchema('v:double')\n"
        "def square(x):\n"
        "    return None if x is None else float(x) * float(x)\n"
        "\n"
        "@outputSchema('s:chararray')\n"
        "def shout(s):\n"
        "    return None if s is None else s.upper() + '!'\n")
    rels = run_script(eng, f"""
        REGISTER '{udfs}' AS myns;
        r = LOAD '/root/testdata/sf0.001/region.parquet';
        p = FOREACH r GENERATE r_regionkey,
                               myns.square(r_regionkey) AS sq,
                               myns.shout(r_name) AS nm;
        out = ORDER p BY r_regionkey;
    """)
    rows = [(r["r_regionkey"], r["sq"], r["nm"])
            for r in rels["out"].df().collect()]
    assert rows[0] == (0, 0.0, "AFRICA!")
    assert rows[4] == (4, 16.0, "MIDDLE EAST!")
