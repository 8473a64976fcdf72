"""MERGE-style upsert: the incremental-maintenance primitive (ANSI
MERGE INTO / Delta-Lake merge shape) for refreshing a large snapshot
with a small batch of changes — the standard way a 100 TB training
corpus absorbs a day's crawl without rewriting itself.

Spark-first shape: the big side (base) is touched by exactly ONE
anti-join against the change-batch keys; when the batch is broadcast-
able (the normal case — changes are small relative to the snapshot) the
base NEVER shuffles: BroadcastHashJoin(LeftAnti) + union is a map-only
plan over the snapshot. Combine with a partitioned STORE and only the
affected partitions need rewriting (dynamic partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, keys: list[str],
                 version_col: str | None = None,
                 delete_col: str | None = None,
                 broadcast_updates: bool = True) -> DataFrame:
    """Merge `updates` into `base` on `keys`:

    - a key present in updates replaces the base row (upsert);
    - a key absent from base is inserted;
    - if `delete_col` names a boolean column in updates, rows where it
      is true DELETE the key instead (the column is dropped from the
      output);
    - if `version_col` is given and updates carries several rows per
      key, only the highest version per key is applied (max-version
      aggregation first — map-side combined, no window over the base).

    Output schema = base schema. The base participates in one anti-join
    only; `broadcast_updates=True` (default) hints the batch keys to a
    broadcast so the snapshot side stays exchange-free — set False when
    the change batch is itself huge (falls back to a shuffled anti-join,
    still one pass).
    """
    for k in keys:
        if k not in base.columns or k not in updates.columns:
            raise ValueError(f"merge key {k!r} missing from an input")
    upd = updates
    if version_col is not None:
        # highest version per key wins; several rows AT the max version
        # are resolved deterministically by the remaining columns
        # (descending) — never an arbitrary dropDuplicates survivor.
        # The window shuffles only the small change batch, not the base.
        from pyspark.sql.window import Window
        others = [c for c in upd.columns
                  if c not in keys and c != version_col]
        w = Window.partitionBy(*keys).orderBy(
            F.col(version_col).desc_nulls_last(),
            *[F.col(c).desc_nulls_last() for c in others])
        upd = (upd.withColumn("__rn", F.row_number().over(w))
                  .where(F.col("__rn") == 1).drop("__rn"))
    if delete_col is not None:
        # deleted keys are removed by the anti-join below and simply
        # not re-inserted here
        upd = upd.where((F.col(delete_col).isNull())
                        | (F.col(delete_col) == F.lit(False)))
        upd = upd.drop(delete_col)
    # every changed/deleted key leaves the base exactly once
    changed = updates.select(*keys).dropDuplicates(keys)
    if broadcast_updates:
        changed = F.broadcast(changed)
    kept = base.join(changed, on=keys, how="left_anti")
    return kept.unionByName(upd.select(*base.columns))
