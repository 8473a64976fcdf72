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


def read(spark: SparkSession, path: str, fmt: str = "parquet",
         schema=None, options: dict | None = None) -> DataFrame:
    fmt = _norm(fmt)
    options = dict(options or {})
    reader = spark.read
    if fmt == "csv":
        options.setdefault("sep", "\t")       # PigStorage default delimiter
        options.setdefault("header", "false")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "json":
        pass                                   # let Spark infer JSON schema
    return reader.options(**options).format(fmt).load(path)


def write(df: DataFrame, path: str, fmt: str = "parquet",
          options: dict | None = None, partition_by: list[str] | None = None,
          mode: str = "overwrite") -> None:
    fmt = _norm(fmt)
    options = dict(options or {})
    if fmt == "csv":
        options.setdefault("sep", "\t")
    w = df.write.mode(options.pop("mode", mode)).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)
