"""Builtin function edge matrix (SURVEY.md §2.4–2.5, mirroring the
reference's TestBuiltin.java): 0-based SUBSTRING/INDEXOF, Math.round
semantics, SIZE by type, TOKENIZE delimiters, duration arithmetic,
aggregate null-skipping and type promotion."""

import datetime

from spork_spark import col, fn, lit


def one(eng, spark, expr, data=None, ddl="x int"):
    df = spark.createDataFrame(data or [(1,)], ddl)
    return eng.from_df(df).foreach(expr.alias("out")).df().collect()[0][0]


def test_substring_pig_semantics(eng, spark):
    data, ddl = [("hello",)], "s string"
    assert one(eng, spark, fn("SUBSTRING", col("s"), 1, 3), data, ddl) == "el"
    assert one(eng, spark, fn("SUBSTRING", col("s"), 0, 99), data, ddl) == "hello"
    assert one(eng, spark, fn("SUBSTRING", col("s"), 9, 12), data, ddl) is None
    assert one(eng, spark, fn("SUBSTRING", col("s"), 2, 2), data, ddl) == ""


def test_indexof_zero_based(eng, spark):
    data, ddl = [("hello",)], "s string"
    assert one(eng, spark, fn("INDEXOF", col("s"), lit("l")), data, ddl) == 2
    assert one(eng, spark, fn("INDEXOF", col("s"), lit("z")), data, ddl) == -1
    assert one(eng, spark, fn("INDEXOF", col("s"), lit("l"), lit(3)),
               data, ddl) == 3


def test_last_index_of(eng, spark):
    data, ddl = [("hello",)], "s string"
    assert one(eng, spark, fn("LAST_INDEX_OF", col("s"), lit("l")), data, ddl) == 3
    assert one(eng, spark, fn("LAST_INDEX_OF", col("s"), lit("z")), data, ddl) == -1


def test_round_is_java_math_round(eng, spark):
    ddl = "x double"
    assert one(eng, spark, fn("ROUND", col("x")), [(2.5,)], ddl) == 3
    assert one(eng, spark, fn("ROUND", col("x")), [(-2.5,)], ddl) == -2  # ≠ HALF_UP
    assert one(eng, spark, fn("ROUND", col("x")), [(2.4,)], ddl) == 2


def test_ucfirst_only_first_char(eng, spark):
    assert one(eng, spark, fn("UCFIRST", col("s")), [("hello world",)],
               "s string") == "Hello world"     # initcap would give "Hello World"


def test_concat_null_propagates(eng, spark):
    assert one(eng, spark, fn("CONCAT", col("a"), col("b")),
               [("x", None)], "a string, b string") is None


def test_tokenize_delimiters(eng, spark):
    out = one(eng, spark, fn("TOKENIZE", col("s")),
              [('a b,"c"(d)*e',)], "s string")
    assert [t["token"] for t in out] == ["a", "b", "c", "d", "e"]


def test_size_by_type(eng, spark):
    assert one(eng, spark, fn("SIZE", col("s")), [("héllo",)], "s string") == 5
    assert one(eng, spark, fn("SIZE", col("b")),
               [([1, 2, 3],)], "b array<int>") == 3
    assert one(eng, spark, fn("SIZE", col("m")),
               [({"a": 1},)], "m map<string,int>") == 1
    assert one(eng, spark, fn("SIZE", col("t")),
               [((1, 2),)], "t struct<x:int,y:int>") == 2
    assert one(eng, spark, fn("SIZE", col("x")), [(3,)], "x int") == 1
    assert one(eng, spark, fn("SIZE", col("x")), [(None,)], "x int") is None


def test_isempty(eng, spark):
    assert one(eng, spark, fn("ISEMPTY", col("b")), [([],)],
               "b array<struct<x:int>>") is True
    assert one(eng, spark, fn("ISEMPTY", col("b")), [([(1,)],)],
               "b array<struct<x:int>>") is False


def test_regex_extract_null_on_no_match(eng, spark):
    data, ddl = [("ab123cd",)], "s string"
    assert one(eng, spark,
               fn("REGEX_EXTRACT", col("s"), lit(r"(\d+)"), lit(1)),
               data, ddl) == "123"
    assert one(eng, spark,
               fn("REGEX_EXTRACT", col("s"), lit(r"(zz)"), lit(1)),
               data, ddl) is None


def test_regex_extract_all_groups(eng, spark):
    out = one(eng, spark,
              fn("REGEX_EXTRACT_ALL", col("s"), lit(r"(\w+) (\w+)")),
              [("hello world",)], "s string")
    assert tuple(out) == ("hello", "world")


def test_strsplit_and_bagtostring(eng, spark):
    out = one(eng, spark, fn("STRSPLIT", col("s"), lit(",")),
              [("a,b,c",)], "s string")
    assert list(out) == ["a", "b", "c"]


def test_sprintf(eng, spark):
    assert one(eng, spark, fn("SPRINTF", lit("%05d-%s"), col("x"), lit("z")),
               [(42,)], "x int") == "00042-z"


def test_replace_is_regex_replace_all(eng, spark):
    assert one(eng, spark, fn("REPLACE", col("s"), lit("[0-9]+"), lit("#")),
               [("a1b22c",)], "s string") == "a#b#c"


def test_sum_int_promotes_to_long(eng, spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    rel = (eng.from_df(df).as_alias("t").group_all()
           .foreach(fn("SUM", col("t").get("x")).alias("s")))
    assert dict(rel.df().dtypes)["s"] == "bigint"
    assert rel.df().collect()[0][0] == 3


def test_avg_int_returns_double(eng, spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    rel = (eng.from_df(df).as_alias("t").group_all()
           .foreach(fn("AVG", col("t").get("x")).alias("a")))
    assert dict(rel.df().dtypes)["a"] == "double"
    assert rel.df().collect()[0][0] == 1.5


def test_aggregates_skip_nulls(eng, students):
    rel = (eng.from_df(students).as_alias("s").group_all()
           .foreach(fn("COUNT", col("s").get("gpa")).alias("c"),
                    fn("MIN", col("s").get("gpa")).alias("mn"),
                    fn("MAX", col("s").get("gpa")).alias("mx")))
    c, mn, mx = rel.df().collect()[0]
    assert (c, mn, mx) == (6, 1.0, 3.9)


def test_datetime_roundtrip_and_parts(eng, spark):
    data = [(datetime.datetime(2024, 3, 15, 10, 30, 45),)]
    ddl = "ts timestamp"
    assert one(eng, spark, fn("GETYEAR", col("ts")), data, ddl) == 2024
    assert one(eng, spark, fn("GETMONTH", col("ts")), data, ddl) == 3
    assert one(eng, spark, fn("GETDAY", col("ts")), data, ddl) == 15
    assert one(eng, spark, fn("GETHOUR", col("ts")), data, ddl) == 10


def test_todate_with_format(eng, spark):
    out = one(eng, spark, fn("TODATE", col("s"), lit("yyyy/MM/dd")),
              [("2024/03/15",)], "s string")
    assert out == datetime.datetime(2024, 3, 15)


def test_add_duration_iso8601(eng, spark):
    data = [(datetime.datetime(2024, 1, 1, 0, 0, 0),)]
    out = one(eng, spark, fn("ADDDURATION", col("ts"), lit("P1DT2H")),
              data, "ts timestamp")
    assert out == datetime.datetime(2024, 1, 2, 2, 0, 0)
    out2 = one(eng, spark, fn("SUBTRACTDURATION", col("ts"), lit("PT30M")),
               data, "ts timestamp")
    assert out2 == datetime.datetime(2023, 12, 31, 23, 30, 0)


def test_between_functions_truncate(eng, spark):
    d1 = datetime.datetime(2024, 1, 2, 23, 0, 0)
    d0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    data, ddl = [(d1, d0)], "a timestamp, b timestamp"
    assert one(eng, spark, fn("DAYSBETWEEN", col("a"), col("b")), data, ddl) == 1
    assert one(eng, spark, fn("HOURSBETWEEN", col("a"), col("b")), data, ddl) == 47
    assert one(eng, spark, fn("SECONDSBETWEEN", col("a"), col("b")),
               data, ddl) == 169200


def test_totuple_tobag_tomap(eng, spark):
    data, ddl = [(1, "x")], "a int, b string"
    t = one(eng, spark, fn("TOTUPLE", col("a"), col("b")), data, ddl)
    assert tuple(t) == (1, "x")
    bag = one(eng, spark, fn("TOBAG", col("a")), data, ddl)
    assert len(bag) == 1 and bag[0][0] == 1
    m = one(eng, spark, fn("TOMAP", col("b"), col("a")), data, ddl)
    assert m == {"x": 1}


def test_diff_and_subtract(eng, spark):
    data = [([1, 2, 3], [2, 3, 4])]
    ddl = "a array<int>, b array<int>"
    assert sorted(one(eng, spark, fn("SUBTRACT", col("a"), col("b")),
                      data, ddl)) == [1]
    assert sorted(one(eng, spark, fn("DIFF", col("a"), col("b")),
                      data, ddl)) == [1, 4]


def test_top_builtin(spark):
    """TOP(n, fieldIdx, bag) — bag of the n largest-by-field tuples."""
    from spork_spark import Engine, col, fn, lit
    eng = Engine(spark)
    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("a", 3), ("a", 2), ("b", 9)], "k string, v int")
    rel = eng.from_df(df, alias="t")
    out = (rel.group_by(col("k"))
              .foreach(col("group").alias("k"),
                       fn("SUM", fn("TOP", lit(2), lit(1), col("t"))
                          .get("v")).alias("top2_sum"))
              .order_by(col("k"))).df().collect()
    assert [(r.k, r.top2_sum) for r in out] == [("a", 8), ("b", 9)]


def test_md5_sha256_portable(eng, spark):
    """MD5/SHA256 (extension): digest of the value's string form, matching
    other engines byte-for-byte — the basis of reproducible corpus splits
    (q_sample_deterministic)."""
    import hashlib
    from spork_spark import col, fn
    df = spark.createDataFrame([(123,), (456,)], "k long")
    r = (eng.from_df(df)
            .foreach(col("k"), fn("MD5", col("k")).alias("h"),
                     fn("SHA256", col("k")).alias("s2")))
    for row in r.df().collect():
        assert row.h == hashlib.md5(str(row.k).encode()).hexdigest()
        assert row.s2 == hashlib.sha256(str(row.k).encode()).hexdigest()


def test_getweekyear_iso_boundaries(eng, spark):
    """ISO week-year (Joda weekyear contract): Jan 1 can belong to the
    previous week-year, Dec 31 to the next."""
    data, ddl = [("2021-01-01",), ("2019-12-30",), ("2016-01-03",),
                 ("2020-12-31",)], "s string"
    df = spark.createDataFrame(data, ddl)
    out = (eng.from_df(df)
              .foreach(fn("GETWEEKYEAR", fn("TODATE", col("s"), "yyyy-MM-dd"))
                       .alias("wy")).df().collect())
    assert [r.wy for r in out] == [2020, 2020, 2015, 2020]


def test_bagtostring_flattens_tuple_fields(eng, spark):
    """BagToString joins every field of every tuple with the delimiter
    (pig BagToString.java)."""
    df = spark.createDataFrame([(1, "a", 10), (1, "b", 20)],
                               "k int, s string, v int")
    g = eng.from_df(df, alias="t").group_by(col("k"))
    out = (g.foreach(col("group").alias("k"),
                     fn("BAGTOSTRING",
                        fn("SORT_BAG", col("t"), "s", True), "_")
                     .alias("joined")).df().collect())
    assert out[0].joined == "1_a_10_1_b_20"


def test_bagtostring_single_field_projection(eng, spark):
    df = spark.createDataFrame([(1, "x"), (1, "y")], "k int, s string")
    g = eng.from_df(df, alias="t").group_by(col("k"))
    out = (g.foreach(fn("BAGTOSTRING",
                        fn("SORT_BAG", col("t"), "s", True).get("s"), ",")
                     .alias("joined")).df().collect())
    assert out[0].joined == "x,y"


def test_map_keyset_valuelist_valueset(eng, spark):
    """KEYSET / VALUELIST / VALUESET (PIG-2600,
    pig:src/org/apache/pig/builtin/) — bags of keys, values (dupes
    kept), and distinct values."""
    from spork_spark import col, fn
    data = [({"a": 1, "b": 2, "c": 2},)]
    ddl = "m map<string,int>"
    ks = one(eng, spark, fn("KEYSET", col("m")), data, ddl)
    assert sorted(t[0] for t in ks) == ["a", "b", "c"]
    vl = one(eng, spark, fn("VALUELIST", col("m")), data, ddl)
    assert sorted(t[0] for t in vl) == [1, 2, 2]
    vs = one(eng, spark, fn("VALUESET", col("m")), data, ddl)
    assert sorted(t[0] for t in vs) == [1, 2]


def test_map_inversemap(eng, spark):
    """INVERSEMAP([open#apache, 1#2, 11#2]) = [apache#{(open)},
    2#{(1),(11)}] — the documented Pig example: values become chararray
    keys, colliding entries collect a bag of the original keys."""
    from spork_spark import col, fn
    data = [({"open": "apache", "1": "2", "11": "2"},)]
    ddl = "m map<string,string>"
    inv = one(eng, spark, fn("INVERSEMAP", col("m")), data, ddl)
    got = {k: sorted(t[0] for t in bag) for k, bag in inv.items()}
    assert got == {"apache": ["open"], "2": ["1", "11"]}


def test_map_builtins_property(eng, spark):
    """Property check over generated maps (unicode keys, collisions,
    empty map, null values): KEYSET/VALUELIST/VALUESET/INVERSEMAP match
    a pure-Python model of the Pig semantics."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spork_spark import col, fn

    keys = st.text(min_size=1, max_size=6)
    vals = st.one_of(st.none(), st.integers(-5, 5))
    maps = st.dictionaries(keys, vals, max_size=6)

    @settings(max_examples=25, deadline=None)
    @given(m=maps)
    def check(m):
        data, ddl = [(m,)], "m map<string,int>"
        ks = one(eng, spark, fn("KEYSET", col("m")), data, ddl)
        assert sorted(t[0] for t in ks) == sorted(m.keys())
        vl = one(eng, spark, fn("VALUELIST", col("m")), data, ddl)
        assert sorted((t[0] for t in vl), key=repr) \
            == sorted(m.values(), key=repr)
        vs = one(eng, spark, fn("VALUESET", col("m")), data, ddl)
        assert sorted((t[0] for t in vs), key=repr) \
            == sorted(set(m.values()), key=repr)
        inv = one(eng, spark, fn("INVERSEMAP", col("m")), data, ddl)
        # null-valued entries are dropped (Spark maps forbid null keys)
        model = {}
        for k, v in m.items():
            if v is not None:
                model.setdefault(str(v), []).append(k)
        got = {k: sorted(t[0] for t in bag)
               for k, bag in (inv or {}).items()}
        assert got == {k: sorted(v) for k, v in model.items()}

    check()
