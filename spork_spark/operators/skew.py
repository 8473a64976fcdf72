"""Skew-tolerant join via key salting — the manual fallback when AQE's
skew-join splitting isn't enough (one pathological key dominating).

The reference's skewed join (pig:…/SkewedPartitioner.java + PoissonSample
histogram, SURVEY.md §2.1 #12) samples the left key distribution and
splits hot keys across reducers, replicating matching right rows. The
Spark-first equivalents, in order:

1. `spark.sql.adaptive.skewJoin.enabled` (on in the engine session) —
   AQE splits oversized shuffle partitions at runtime. Zero code.
   PREFER THIS: on the measured 20%-hot-key fixture (SKEW_r06.json,
   sf1) AQE's split join costs 0.52 s where salted_join costs 3.87 s —
   the salt's right-side replication is pure overhead whenever AQE can
   split the partition.
2. `salted_join` below — deterministic pre-shuffle salting for the
   cases AQE's OptimizeSkewedJoin skips: sessions without AQE, join
   modes it won't split (full outer), and plans where splitting would
   break a downstream distribution requirement (the rule bails rather
   than insert an extra shuffle). The trade is measured and real —
   reach for it only when the AQE plan provably didn't split
   (no `skew=true` in the final adaptive plan).

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


def heavy_hitters(df: DataFrame, key: str,
                  min_frac: float = 0.01) -> DataFrame:
    """EXACT frequent-items: every non-null value of `key` whose global
    frequency is >= min_frac of the row count, with its exact count —
    via candidate-then-verify, so the long tail of rare keys never
    enters an exchange:

    1. Candidates: per-partition Misra-Gries with k = ceil(1/min_frac)
       counters (mapInPandas, Arrow batches; per batch a vectorized
       value_counts merge, then the summaries are reduced back to k
       counters by subtracting the (k+1)-th largest — the mergeable-
       summaries reduction of Agarwal et al. 2012, which preserves the
       MG undercount bound n_p/(k+1)). Bounded memory, NO shuffle,
       output <= k rows per partition. Pigeonhole: a value with global
       count >= min_frac*n has local count >= min_frac*n_p in some
       partition, and min_frac > 1/(k+1), so candidates ⊇ answers.
    2. Verify: exact counts of the candidate values only — broadcast
       semi-join filter on the scan, then a groupBy whose key set is
       <= k * num_partitions, and a broadcast of the 1-row total for
       the threshold test (integer ppm arithmetic: exact on any
       engine, no float-boundary flake; min_frac quantized to 1e-6).

    A plain groupBy-HAVING shuffles every distinct key; at 100 TB with
    a ~billion-key long tail this shape shuffles only candidates. The
    trade: one extra scan and a Python hop for stage 1 — worth it
    exactly when the tail dominates; for low-cardinality keys use
    skew_histogram.
    """
    import math
    import pandas as pd

    if not (0.0 < min_frac <= 1.0):
        raise ValueError("min_frac must be in (0, 1]")
    k = int(math.ceil(1.0 / min_frac))
    ppm = int(round(min_frac * 1_000_000))
    dtype = df.schema[key].dataType.simpleString()

    def mg_candidates(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[key].dropna().value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - cut for v, c in counters.items()
                            if c > cut}
        yield pd.DataFrame({key: list(counters.keys())})

    nn = df.where(F.col(key).isNotNull())
    cand = (nn.select(F.col(key))
              .mapInPandas(mg_candidates, schema=f"`{key}` {dtype}")
              .dropDuplicates([key]))
    # denominator = non-null rows, matching the numerator's universe
    total = nn.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    return (nn.join(F.broadcast(cand), on=key, how="left_semi")
              .groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
              .crossJoin(F.broadcast(total))
              .where(F.col("cnt") * 1_000_000 >= F.lit(ppm) * F.col("__n"))
              .select(F.col(key), F.col("cnt").cast("long").alias("cnt")))
