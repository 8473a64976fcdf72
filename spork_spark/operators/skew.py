"""Skew-tolerant join via key salting — the manual fallback when AQE's
skew-join splitting isn't enough (one pathological key dominating).

The reference's skewed join (pig:…/SkewedPartitioner.java + PoissonSample
histogram, SURVEY.md §2.1 #12) samples the left key distribution and
splits hot keys across reducers, replicating matching right rows. The
Spark-first equivalents, in order:

1. `spark.sql.adaptive.skewJoin.enabled` (on in the engine session) —
   AQE splits oversized shuffle partitions at runtime. Zero code.
2. `salted_join` below — deterministic pre-shuffle salting when the skew
   is known or AQE's post-shuffle splitting can't help (e.g. a single key
   larger than an executor).

salted_join replicates the RIGHT side `salt` times (explode over a
literal range — cheap when right is the smaller input, as in the
reference, which replicates the non-sampled side) and scatters LEFT rows
uniformly across the salt space, so one hot key spreads over `salt`
reducers. Inner/left joins only (same restriction as Pig's skewed join,
which supports inner + left outer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame,
                left_keys: list[str], right_keys: list[str],
                how: str = "inner", salt: int = 16) -> DataFrame:
    """Equi-join with uniform left-side salting over `salt` buckets.

    Result is bitwise-identical to the plain join (salt columns are
    dropped); only the shuffle distribution changes: each (key, salt_i)
    pair forms its own reducer partition.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (as the "
                         "reference's skewed join does)")
    lsalt = left.withColumn("__salt",
                            (F.rand(seed=0) * salt).cast("int"))
    rsalt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    cond = None
    for lk, rk in zip(left_keys, right_keys):
        c = lsalt[lk] == rsalt[rk]
        cond = c if cond is None else cond & c
    cond = cond & (lsalt["__salt"] == rsalt["__salt"])
    out = lsalt.join(rsalt, on=cond, how=how)
    return out.drop("__salt")


def skew_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """The reference's sampling job, as a utility: top-N key frequencies
    (run on a sample at scale: df.sample(0.01) first)."""
    return (df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
              .orderBy(F.col("cnt").desc()).limit(top))
