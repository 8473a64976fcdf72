"""Bloom-filter join pruning (pig:src/org/apache/pig/builtin/BuildBloom.java
/ Bloom.java — build a bloom filter from one relation, FILTER another by it
before a join).

Spark 4.1 does not expose ``bloom_filter_agg``/``might_contain`` in the
public function registry, so the filter is built from native expressions:

- build: each build-side key hashes to ``n_hashes`` bit positions
  (xxhash64 with per-hash seeds, mod ``n_bits``); explode + collect_set
  aggregates the set-bit list — at most ``n_bits`` ints, safely
  broadcastable (the same shape the reference ships as a side file).
- probe: a row survives iff ALL its positions are set —
  ``forall(positions, p -> array_contains(bits, p))`` — classic Bloom
  semantics with the classic false-positive rate; never a false negative.

At scale this is the semi-join-reduction pattern: the probe is a narrow
map over the big side (no shuffle), so the later exact join shuffles only
rows that might match. The exact join after the prune makes the end
result exact, so the pruned pipeline is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key, n_bits: int, n_hashes: int) -> "F.Column":
    return F.array(*[
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))
        for seed in range(n_hashes)])


def build_bloom(df: DataFrame, key: str, n_bits: int = 8192,
                n_hashes: int = 3) -> DataFrame:
    """1-row DataFrame (__bloom_bits: array<bigint>) of set bit positions."""
    return (df.select(F.explode(_positions(F.col(key), n_bits, n_hashes))
                      .alias("__pos"))
              .agg(F.collect_set("__pos").alias("__bloom_bits")))


def bloom_filter(big: DataFrame, bits: DataFrame, key: str,
                 n_bits: int = 8192, n_hashes: int = 3) -> DataFrame:
    """FILTER big BY Bloom(bits, key): keep rows whose every hash position
    is set. False positives possible (rate ~ (1-e^{-kn/m})^k), false
    negatives never — same contract as the reference UDF pair."""
    probe = _positions(F.col(key), n_bits, n_hashes)
    return (big.crossJoin(F.broadcast(bits))
               .filter(F.forall(probe,
                                lambda p: F.array_contains(
                                    F.col("__bloom_bits"), p)))
               .drop("__bloom_bits"))


def bloom_pruned_semi_join(big: DataFrame, small: DataFrame, big_key: str,
                           small_key: str, n_bits: int = 8192,
                           n_hashes: int = 3) -> DataFrame:
    """Exact semi join, bloom-pruned: narrow bloom probe first (no shuffle
    on the big side), exact left-semi join on the survivors. Result equals
    a plain semi join; the bloom only cuts shuffle volume."""
    bits = build_bloom(small, small_key, n_bits, n_hashes)
    pruned = bloom_filter(big, bits, big_key, n_bits, n_hashes)
    return pruned.join(small.select(small_key).distinct(),
                       on=pruned[big_key] == F.col(small_key),
                       how="left_semi")
