"""Load/Store function coverage (SURVEY.md §2.7): PigStorage delimiters,
TextLoader, JSON, compression by extension, globbing, partitioned writes."""

import gzip
import json

import pytest

from spork_spark import col, fn


def rows(rel):
    return sorted(tuple(r) for r in rel.df().collect())


def test_pigstorage_custom_delimiter(eng, spark, tmp_path):
    (tmp_path / "colon.txt").write_text("1:foo\n2:bar\n")
    rel = eng.load(str(tmp_path / "colon.txt"), fmt="pigstorage",
                   schema="k int, s string", sep=":")
    assert rows(rel) == [(1, "foo"), (2, "bar")]


def test_textloader_one_line_one_field(eng, tmp_path):
    (tmp_path / "lines.txt").write_text("alpha\nbeta\n")
    rel = eng.load(str(tmp_path / "lines.txt"), fmt="textloader")
    assert rows(rel) == [("alpha",), ("beta",)]


def test_jsonloader_roundtrip(eng, spark, tmp_path):
    src = tmp_path / "j"
    src.mkdir()
    (src / "part.json").write_text(
        "\n".join(json.dumps({"k": i, "s": f"v{i}"}) for i in range(3)))
    rel = eng.load(str(src), fmt="jsonloader", schema="k bigint, s string")
    assert rows(rel) == [(0, "v0"), (1, "v1"), (2, "v2")]
    rel.store(str(tmp_path / "out_json"), fmt="jsonstorage")
    back = eng.load(str(tmp_path / "out_json"), fmt="json",
                    schema="k bigint, s string")
    assert rows(back) == rows(rel)


def test_gzip_by_extension(eng, tmp_path):
    with gzip.open(tmp_path / "z.tsv.gz", "wt") as f:
        f.write("1\tx\n2\ty\n")
    rel = eng.load(str(tmp_path / "z.tsv.gz"), fmt="pigstorage",
                   schema="k int, s string")
    assert rows(rel) == [(1, "x"), (2, "y")]


def test_path_globbing(eng, tmp_path):
    for i in range(2):
        (tmp_path / f"part-{i}.tsv").write_text(f"{i}\n")
    rel = eng.load(str(tmp_path / "part-*.tsv"), fmt="pigstorage",
                   schema="k int")
    assert rows(rel) == [(0,), (1,)]


def test_partitioned_parquet_write_and_pruning(eng, spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "k int, part string")
    eng.from_df(df).store(str(tmp_path / "pt"), fmt="parquet",
                          partition_by=["part"])
    rel = eng.load(str(tmp_path / "pt")).filter(col("part") == "a")
    assert rel.df().count() == 2
    plan = rel.df()._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan   # partition pruning


def test_untyped_load_defaults_to_string_and_try_cast(eng, tmp_path):
    """The bytearray strategy (§1.3): untyped loads are strings; first
    typed use casts with null-on-failure."""
    (tmp_path / "raw.tsv").write_text("1\tx\noops\ty\n")
    rel = eng.load(str(tmp_path / "raw.tsv"), fmt="pigstorage")
    df = rel.df()
    assert all(t == "string" for _, t in df.dtypes)
    from spork_spark import pos
    casted = rel.foreach(pos(0).cast("int").alias("n"))
    assert sorted(r[0] is None for r in casted.df().collect()) == [False, True]


def test_avro_or_orc_if_available(eng, spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "k int, s string")
    eng.from_df(df).store(str(tmp_path / "orc_out"), fmt="orcstorage")
    back = eng.load(str(tmp_path / "orc_out"), fmt="orc")
    assert rows(back) == [(1, "x")]
    try:
        eng.from_df(df).store(str(tmp_path / "avro_out"), fmt="avrostorage")
    except Exception:
        pytest.skip("spark-avro package not bundled in this environment")
    back = eng.load(str(tmp_path / "avro_out"), fmt="avro")
    assert rows(back) == [(1, "x")]


def test_load_as_schema_is_positional(eng):
    """Pig's AS-schema names fields by POSITION; for self-describing
    formats Spark's name-matching .schema() would null everything out —
    the reader applies a positional rename + try_cast instead."""
    import pytest
    from spork_spark import col

    sf = "/root/testdata/sf0.001"
    n = eng.load(f"{sf}/nation.parquet",
                 schema="nk int, nm string, rk int")
    df = n.filter(col("nk") > 10).df()
    assert df.columns == ["nk", "nm", "rk"]
    assert df.count() == 14
    with pytest.raises(Exception, match="AS schema has"):
        eng.load(f"{sf}/nation.parquet",
                 schema="a int, b string, c int, d string").df()


def test_pigstorage_tagfile_and_store_sep(eng, tmp_path):
    """PigStorage '-tagFile'/'-tagPath' prepend the source file name/path
    (first AS field names the column); STORE USING PigStorage('|') honors
    the separator."""
    (tmp_path / "a.csv").write_text("1,x\n")
    (tmp_path / "b.csv").write_text("2,y\n")
    from spork_spark.parser import run_script
    out = tmp_path / "out"
    rels = run_script(eng, f"""
        a = LOAD '{tmp_path}/*.csv' USING PigStorage(',', '-tagFile')
            AS (fname:chararray, a:int, b:chararray);
        p = LOAD '{tmp_path}/a.csv' USING PigStorage(',', '-tagPath');
        STORE a INTO '{out}' USING PigStorage('|');
    """)
    rows = sorted(tuple(r) for r in rels["a"].df().collect())
    assert rows == [("a.csv", 1, "x"), ("b.csv", 2, "y")]
    assert rels["p"].df().collect()[0][0].endswith("a.csv")
    import glob
    lines = sorted(line.strip() for f in glob.glob(f"{out}/part*")
                   for line in open(f))
    assert lines == ["a.csv|1|x", "b.csv|2|y"]


def test_pigstorage_schema_sidecar(eng, spark, tmp_path):
    """PigStorage('-schema'): STORE writes .pig_schema; a schemaless LOAD
    restores names AND types from the sidecar."""
    from spork_spark.sources import read, write
    df = spark.createDataFrame([(1, "a", 2.5), (2, "b", 3.5)],
                               "k int, s string, v double")
    path = str(tmp_path / "sidecar_out")
    write(df, path, fmt="pigstorage", options={"schema": True})
    back = read(spark, path, fmt="pigstorage")
    assert [f.name for f in back.schema.fields] == ["k", "s", "v"]
    assert [f.dataType.simpleString() for f in back.schema.fields] == \
        ["int", "string", "double"]
    assert sorted(map(tuple, back.collect())) == [(1, "a", 2.5), (2, "b", 3.5)]
