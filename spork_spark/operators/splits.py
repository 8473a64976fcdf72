"""Leakage-safe dataset splitting: train/test assignment that never
separates near-duplicate documents.

A plain hash split leaks: if doc A (train) and doc B (test) are
near-duplicates, the model is evaluated on data it effectively saw —
the contamination mode decontamination papers (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better") measure.
The fix is to split at the duplicate-CLUSTER level: close the pair
relation transitively (connected components), then hash the cluster
representative, so every member of a cluster lands in the same split.

Spark-first shape: components come from the existing O(log d)
pointer-jumping operator (graph.connected_components); the assignment
is one left join (docs → component label, isolated docs are their own
representative) plus a pure-Column md5 bucket — engine-portable, so an
oracle (or a second pipeline run) reproduces the exact assignment.
Weights are integer percent for exact arithmetic; the split boundary is
a cumulative-weight comparison on `bucket = md5(salt || rep) % 100`.

At 100 TB: the pair relation is the expensive input (built once by the
LSH/near-dup pipeline and reused here); everything downstream is
component iterations on the PAIRS (usually ≪ corpus) plus one
broadcast-or-shuffle join back to the corpus. Assignment is stable
under corpus growth: new isolated docs hash independently; new pairs
only ever merge clusters (a merged cluster re-hashes under its
smallest id, the deterministic representative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import connected_components


def split_assignment(rep: F.Column, splits: list[tuple[str, int]],
                     salt: str) -> F.Column:
    """md5-bucket split: `md5(salt || rep) % 100` compared against the
    cumulative integer-percent boundaries. Engine-portable: DuckDB
    replays it as ('0x' || substring(md5(...), 1, 15))::BIGINT % 100."""
    bucket = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), rep.cast("string"))), 1, 15),
            16, 10).cast("bigint"),
        F.lit(100))
    acc = 0
    expr = None
    for name, pct in splits:
        acc += pct
        cond = bucket < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit(splits[-1][0]))


def leakage_safe_split(df: DataFrame, id_col: str, pairs: DataFrame,
                       splits: list[tuple[str, int]] | None = None,
                       salt: str = "split-v1",
                       out_col: str = "split") -> DataFrame:
    """Assign every row of `df` to a named split such that rows
    connected through `pairs` (near-duplicate candidate pairs with
    columns id_a/id_b over `id_col` values) always share a split.

    `splits` is an ordered list of (name, integer_percent) summing to
    100 — integers so the boundary arithmetic is exact and replayable.
    The assignment hashes the duplicate-cluster representative (the
    smallest id in the component; a row in no pair represents itself),
    salted so independent splits of the same corpus decorrelate.
    """
    splits = splits or [("train", 90), ("test", 10)]
    if sum(p for _, p in splits) != 100:
        raise ValueError("split percents must sum to 100")
    if any(p <= 0 for _, p in splits):
        raise ValueError("split percents must be positive")
    comp = connected_components(pairs, "id_a", "id_b") \
        .withColumnRenamed("node", "__node")
    joined = df.join(comp, df[id_col] == F.col("__node"), "left")
    rep = F.coalesce(F.col("comp"), df[id_col])
    return (joined
            .withColumn(out_col, split_assignment(rep, splits, salt))
            .drop("__node", "comp"))


def consistent_sample(df: DataFrame, key_col: str, rate_pct: int,
                      salt: str = "cs") -> DataFrame:
    """Deterministic JOIN-PRESERVING sample: keep a row iff its KEY's
    md5 bucket falls under ``rate_pct`` of the 16-bit space — the
    100 TB debugging move. Because membership is a pure function of
    (key, salt), any two tables sampled with the same key and salt
    keep matching keys TOGETHER:

        sample(A) ⋈ sample(B)  ==  sample(A ⋈ B)

    whereas independent row samples keep only ~rate² of join pairs and
    break referential integrity. Rerunnable (no RNG state), map-only
    (the predicate fuses into the scan and pushes to the reader), and
    stable under corpus growth — a key's verdict never changes, so
    yesterday's sampled debug extract is a subset of today's.
    """
    if not 0 <= rate_pct <= 100:
        raise ValueError("rate_pct must be in [0, 100]")
    prefix = F.substring(F.md5(F.concat(F.lit(f"{salt}:"),
                                        F.col(key_col).cast("string"))),
                         1, 4)
    bucket = F.conv(prefix, 16, 10).cast("int")
    return df.where(bucket < (65536 * rate_pct) // 100)
