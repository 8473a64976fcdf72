"""Custom partitioner support — Pig's ``PARTITION BY <class>`` clause
(SURVEY.md §2.1 clause notes; pig:src/org/apache/pig/parser — the clause
names a Hadoop ``Partitioner`` whose ``getPartition(key, value, n)``
decides the reducer, i.e. the physical PLACEMENT of each group; results
are identical under any partitioner).

Spark-first mapping: Catalyst owns shuffle placement for DataFrame ops
and exposes no partitioner hook, so a user-supplied placement function is
honored on the OUTPUT of the group — the observable effect in Pig (which
part-file a group's rows land in under STORE). This is the one documented
RDD escape in the engine: ``rdd.partitionBy`` is the only Spark surface
that accepts an arbitrary Python placement function.

Scale note: the round-trip crosses rows to Python once (pickled, not
Arrow). That is the intrinsic price of running a *Python* placement
function per row at any cluster size; placement-sensitive pipelines that
don't need custom code should use ``PARALLEL`` / bucketing instead, which
stay JVM-side.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def custom_partition(df: DataFrame, key_cols: list[str], n: int,
                     fn: Callable) -> DataFrame:
    """Repartition ``df`` into ``n`` partitions, placing each row by
    ``fn(key) % n`` where ``key`` is the value of ``key_cols[0]`` (single
    key) or a tuple of the key columns (compound key). ``fn`` must be
    picklable and return an int (the Partitioner.getPartition contract,
    with Spark applying the modulo)."""
    spark = df.sparkSession
    schema = df.schema
    single = len(key_cols) == 1
    k0 = key_cols[0]
    cols = list(key_cols)

    def key_of(row):
        return row[k0] if single else tuple(row[c] for c in cols)

    placed = (df.rdd
                .map(lambda row: (key_of(row), row))
                .partitionBy(max(int(n), 1), fn)
                .values())
    return spark.createDataFrame(placed, schema)
