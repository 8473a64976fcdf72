"""Snapshot diff + table fingerprinting: the change-data-capture and
anti-entropy primitives an incremental 100 TB pipeline runs between
refreshes.

- `snapshot_diff` classifies every key as added / removed / changed
  between two versions of a table (the CDC feed `merge_upsert` consumes,
  derived when the upstream gives you full snapshots instead of a log).
- `table_fingerprint` reduces a table to a few hundred order-insensitive
  per-bucket digests, so two copies (primary vs replica, pre- vs
  post-migration) can be compared by exchanging KB of checksums instead
  of re-reading 100 TB twice; a mismatching bucket narrows the repair to
  1/num_buckets of the keyspace (Merkle-style anti-entropy, the
  Dynamo/Cassandra repair design).

Spark-first shapes:
- diff = one full-outer sort-merge join on the keys — each side shuffles
  exactly once; with both snapshots bucketed on the keys the exchange is
  elided entirely. No window, no driver-side state.
- fingerprint = map-side md5 digest per row folded by ONE hash
  aggregate; sum/xor are commutative so the result is partition- and
  order-independent, and the partial aggregation makes the shuffle
  num_buckets rows per task regardless of input size.

Digests are md5-based (engine-portable) so an external system — or the
DuckDB oracle — reproduces them bit-for-bit: value = first 15 hex chars
(60 bits) of md5, summed exactly in DECIMAL(38,0) and xor-folded in
BIGINT.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# separates / stands in for column values inside the row digest string;
# chr(1)/chr(2) never occur in the data model's text domains
_SEP = "\x01"
_NULL = "\x02"


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Classify keys across two snapshot versions.

    Returns one row per key whose state differs: the key columns
    (coalesced across sides), a `change_type` of 'added' (key only in
    `new`), 'removed' (only in `old`) or 'changed' (present in both with
    any compare column differing, null-safely), plus `old_<c>` /
    `new_<c>` value pairs for each compare column. Unchanged keys are
    dropped — on a mostly-stable snapshot the output is tiny relative to
    the inputs.

    `compare_cols` defaults to every non-key column the two schemas
    share. One full-outer join on the keys; each input shuffles once.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c in new.columns and c not in keys]
    for k in keys:
        if k not in old.columns or k not in new.columns:
            raise ValueError(f"diff key {k!r} missing from an input")
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__o"))
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__n"))
    cond = reduce(lambda a, b: a & b,
                  [o[f"__ok_{k}"].eqNullSafe(n[f"__nk_{k}"]) for k in keys])
    j = o.join(n, cond, "full_outer")
    same = reduce(lambda a, b: a & b,
                  [F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
                   for c in compare_cols]) if compare_cols else F.lit(True)
    j = (j.withColumn("change_type",
                      F.when(F.col("__o").isNull(), F.lit("added"))
                       .when(F.col("__n").isNull(), F.lit("removed"))
                       .otherwise(F.lit("changed")))
          .where(F.col("__o").isNull() | F.col("__n").isNull() | ~same))
    out_keys = [F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
                for k in keys]
    pairs = [c for cc in compare_cols for c in (f"old_{cc}", f"new_{cc}")]
    return j.select(*out_keys, "change_type", *pairs)


def row_digest(cols: list[str]) -> F.Column:
    """60-bit engine-portable row digest: BIGINT value of the first 15
    hex chars of md5 over the values joined with a control-char
    separator (nulls get a distinct sentinel so (null) != ('')).
    DuckDB replays it as ('0x' || substring(md5(...), 1, 15))::BIGINT."""
    parts: list[F.Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(_SEP))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit(_NULL)))
    return F.conv(F.substring(F.md5(F.concat(*parts)), 1, 15), 16, 10) \
            .cast("bigint")


def table_fingerprint(df: DataFrame, cols: list[str] | None = None,
                      group_cols: list[str] | None = None,
                      num_buckets: int = 256) -> DataFrame:
    """Order-insensitive per-bucket table checksum.

    Digests each row over `cols` (default: all columns — beware float
    formatting if you need cross-engine parity; pass int/string/decimal
    columns explicitly), then folds per group into
    (n_rows, sum_digest, xor_digest):

    - `group_cols=None` buckets rows by `digest % num_buckets`, giving a
      fixed-size Merkle-leaf summary of the whole table;
    - explicit `group_cols` (e.g. a partition column) yields one
      checksum row per partition, the shape for validating a
      partition-at-a-time backfill.

    sum is exact (DECIMAL(38,0): 60-bit values overflow nothing until
    ~1e20 rows) and xor is BIGINT; both are commutative/associative, so
    Spark's partial aggregation computes them map-side and the shuffle
    carries at most num_buckets (or |groups|) rows per task.
    """
    cols = cols or list(df.columns)
    d = df.withColumn("__dv", row_digest(cols))
    if group_cols:
        grouped = d.groupBy(*group_cols)
        key_order = list(group_cols)
    else:
        d = d.withColumn("bucket",
                         (F.col("__dv") % F.lit(num_buckets)).cast("int"))
        grouped = d.groupBy("bucket")
        key_order = ["bucket"]
    return (grouped.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("__dv").cast("decimal(38,0)")).alias("sum_digest"),
                F.expr("bit_xor(__dv)").alias("xor_digest"))
            .orderBy(*key_order))


def fingerprint_compare(a: DataFrame, b: DataFrame,
                        key_order: list[str]) -> DataFrame:
    """Join two fingerprint outputs and keep only mismatching buckets —
    the repair worklist of the anti-entropy exchange. Tiny inputs
    (num_buckets rows); the join broadcasts."""
    bb = b.select(*key_order,
                  F.col("n_rows").alias("n_rows_b"),
                  F.col("sum_digest").alias("sum_digest_b"),
                  F.col("xor_digest").alias("xor_digest_b"))
    j = a.join(F.broadcast(bb), key_order, "full_outer")
    return j.where(~(F.col("n_rows").eqNullSafe(F.col("n_rows_b")) &
                     F.col("sum_digest").eqNullSafe(F.col("sum_digest_b")) &
                     F.col("xor_digest").eqNullSafe(F.col("xor_digest_b"))))
