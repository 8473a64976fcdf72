"""Load/Store functions (SURVEY.md §2.7) → Spark DataSource readers/writers.

The reference's LoadFunc/StoreFunc contracts (LoadMetadata schema + partition
keys, LoadPushDown column pruning, LoadCaster bytes→type,
pig:src/org/apache/pig/LoadFunc.java) are exactly Spark's DataSource
capabilities: schema discovery, partition pruning, column pruning, and filter
pushdown are all native — `.explain` shows PushedFilters/ReadSchema reaching
the parquet scan.

Format map:
- PigStorage (delimited text, default tab) → csv, sep='\t', no header; with
  no AS-schema, columns load as StringType and Pig's implicit casts become
  null-on-failure casts at first typed use (SURVEY.md §1.3 strategy).
- TextLoader → text (one line = one chararray).
- JsonLoader/JsonStorage → json with explicit schema.
- BinStorage/InterStorage/TFileStorage (Pig's binary inter-job formats) →
  parquet, our materialization format.
- AvroStorage/OrcStorage/Parquet → native spark formats.
- Compression (.gz/.bz2 by extension) and path globbing: native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FMT_ALIASES = {
    "pigstorage": "csv",
    "textloader": "text",
    "jsonloader": "json",
    "jsonstorage": "json",
    "binstorage": "parquet",
    "interstorage": "parquet",
    "tfilestorage": "parquet",
    "avrostorage": "avro",
    "orcstorage": "orc",
    "parquetloader": "parquet",
    "parquetstorer": "parquet",
}


def _norm(fmt: str) -> str:
    return _FMT_ALIASES.get(fmt.lower(), fmt.lower())


_nano_cache: dict[str, list[str]] = {}
_load_cache: dict[tuple, "DataFrame"] = {}


def _resolve(path: str) -> str:
    """Resolve a relative path against the PYTHON process cwd. Grunt's
    `cd` (GruntParser processCD) moves the working directory that
    relative LOAD/STORE paths resolve against; Spark would resolve them
    against the JVM's user.dir, which is pinned at JVM start and never
    follows os.chdir — so absolutize before the path reaches Spark."""
    import os
    if "://" in path or path.startswith("file:") or os.path.isabs(path):
        return path
    return os.path.join(os.getcwd(), path)


def _nano_ts_fields(path: str) -> list[str]:
    if path in _nano_cache:
        return _nano_cache[path]
    _nano_cache[path] = _nano_scan(path)
    return _nano_cache[path]


def _nano_scan(path: str) -> list[str]:
    """Parquet TIMESTAMP(NANOS) columns — Spark refuses them by default
    (PARQUET_TYPE_ILLEGAL). Detected via the file footer so the reader can
    transparently load them as long and convert to µs timestamps."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa
        sch = ds.dataset(path, format="parquet").schema
        return [f.name for f in sch
                if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"]
    except Exception:
        return []


def read(spark: SparkSession, path: str, fmt: str = "parquet",
         schema=None, options: dict | None = None) -> DataFrame:
    from pyspark.sql import functions as F

    fmt = _norm(fmt)
    path = _resolve(path)
    options = dict(options or {})
    # Memoize loads per (session, path, fmt, options): repeated queries over
    # the same table reuse one analyzed scan (footer/schema work done once).
    key = (id(spark), path, fmt, str(schema), tuple(sorted(options.items())))
    if key in _load_cache:
        return _load_cache[key]
    reader = spark.read
    # PigStorage -tagFile/-tagPath: prepend the source file name/path as the
    # first column (pig:src/org/apache/pig/builtin/PigStorage.java options).
    # With an AS schema, its first field names the tag column (Pig contract).
    tag_file = options.pop("tagFile", None)
    tag_path = options.pop("tagPath", None)
    tag_name = None
    if (tag_file or tag_path) and schema is not None:
        from pyspark.sql import types as T
        target = schema if isinstance(schema, T.StructType) \
            else T.StructType.fromDDL(schema)
        tag_name = target.fields[0].name
        schema = T.StructType(target.fields[1:])
    if fmt == "csv":
        options.setdefault("sep", "\t")       # PigStorage default delimiter
        options.setdefault("header", "false")
        if schema is None:
            # PigStorage('-schema'): a .pig_schema sidecar written at STORE
            # time restores names+types on LOAD
            # (pig:src/org/apache/pig/builtin/PigStorage.java#getSchema).
            schema = _read_schema_sidecar(spark, path)
    # Pig's AS-schema is POSITIONAL (LOAD 'f' AS (a:int, b) names fields by
    # position). For self-describing formats Spark's .schema() would match
    # by NAME (yielding all-null columns under different names) — so load
    # the file's own schema and apply AS as a positional rename + try_cast
    # (cast failure → null, POCast semantics).
    positional_as = schema is not None and fmt in ("parquet", "orc", "avro")
    if schema is not None and not positional_as:
        reader = reader.schema(schema)

    nano_cols = _nano_ts_fields(path) if fmt == "parquet" and \
        (schema is None or positional_as) else []
    if nano_cols:
        # belt-and-braces for externally built sessions; the engine's own
        # session factory already sets this (session._SEMANTIC_CONF)
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong",
                          "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = reader.options(**options).format(fmt).load(path)
    if nano_cols:
        # ns→µs is lossless here; TIMESTAMP_NTZ matches Spark's own reading
        # of µs parquet files (fixtures are NTZ), session TZ is UTC.
        for c in nano_cols:
            df = df.withColumn(
                c, F.timestamp_micros((F.col(c) / 1000).cast("long"))
                    .cast("timestamp_ntz"))
    if tag_file or tag_path:
        name = tag_name or ("INPUT_FILE_NAME" if tag_file
                            else "INPUT_FILE_PATH")
        tag_col = F.input_file_name() if tag_path else \
            F.regexp_extract(F.input_file_name(), r"([^/]*)$", 1)
        df = df.select(tag_col.alias(name), "*")
    if positional_as:
        from pyspark.sql import types as T
        target = schema if isinstance(schema, T.StructType) \
            else T.StructType.fromDDL(schema)
        if len(target.fields) > len(df.columns):
            raise ValueError(
                f"AS schema has {len(target.fields)} fields but "
                f"{path} has {len(df.columns)} columns")
        df = df.select(*[
            F.col(df.columns[i]).try_cast(f.dataType).alias(f.name)
            for i, f in enumerate(target.fields)])
    _load_cache[key] = df
    return df


def _hadoop_path(spark: SparkSession, path: str):
    """(Path, FileSystem) via the JVM Hadoop FS API — works on any
    Hadoop-compatible filesystem (local, HDFS, object stores), which is
    what a cluster deployment needs for sidecar files."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return hpath, fs


def _write_schema_sidecar(df: DataFrame, path: str) -> None:
    hpath, fs = _hadoop_path(df.sparkSession, path + "/.pig_schema")
    out = fs.create(hpath, True)
    out.write(bytearray(df.schema.json().encode("utf-8")))
    out.close()


def _read_schema_sidecar(spark: SparkSession, path: str):
    from pyspark.sql import types as T
    import json
    try:
        hpath, fs = _hadoop_path(spark, path + "/.pig_schema")
        if not fs.exists(hpath):
            return None
        stream = fs.open(hpath)
        try:
            # commons-io returns the byte[] (py4j copies JVM->Python);
            # FSDataInputStream.readFully mutates a JVM-side copy of a
            # Python-passed buffer, which never comes back.
            jvm = spark.sparkContext._jvm
            data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
        return T.StructType.fromJson(json.loads(data.decode("utf-8")))
    except Exception:
        return None


def write(df: DataFrame, path: str, fmt: str = "parquet",
          options: dict | None = None, partition_by: list[str] | None = None,
          mode: str = "overwrite") -> None:
    fmt = _norm(fmt)
    path = _resolve(path)
    options = dict(options or {})
    sidecar = bool(options.pop("schema", False))
    if fmt == "csv":
        options.setdefault("sep", "\t")
    w = df.write.mode(options.pop("mode", mode)).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)
    if sidecar and fmt == "csv":
        _write_schema_sidecar(df, path)
