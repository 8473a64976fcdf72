"""As-of (temporal) join — an operator Spark's DataFrame API lacks
(SURVEY.md §2.11 custom-operator mandate): for every left row, attach the
most recent right row at-or-before its timestamp, per key.

Spark-first design — the UNION + WINDOW plan, not a range join:
tag both inputs, union them, and take `last(right_payload, ignorenulls)`
over a window partitioned by key and ordered by (ts, side). One shuffle on
the key, sorted once, streamed once — O((|L|+|R|) log) per partition with
bounded memory, versus the naive inequality join's per-key quadratic
blow-up. This is the same trick Flink/KDB-style engines use for temporal
joins, and it scales to 100 TB because the only shuffle is the same
hash-partition a plain join would need, with no skew amplification (hot
keys stay one partition's sorted run, never a cross product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: list[str] | str | None = None,
              right_cols: list[str] | None = None,
              suffix: str = "_asof", tolerance: float | None = None,
              how: str = "left",
              direction: str = "backward") -> DataFrame:
    """For each left row, the latest right row with right.ts <= left.ts
    (per `by` key). Right payload columns come back `<name><suffix>`;
    unmatched rows null-fill (how='left') or drop (how='inner').

    `tolerance` (seconds): matches older than left.ts - tolerance are
    discarded — the standard staleness bound.

    `direction` (pandas merge_asof parity): 'backward' (default,
    right.ts <= left.ts, latest wins), 'forward' (right.ts >= left.ts,
    earliest wins — the SAME union+window plan over the reversed
    order), 'nearest' (smaller |Δts| of the two, ties to backward —
    composed from both passes with the per-row tolerance applied to
    each side before the comparison).

    If several right rows share (key, ts), the winner is the one last in
    the union's sort — make the right side unique per (key, ts) first
    (e.g. groupBy.agg(max)) for deterministic results.
    """
    if how not in ("left", "inner"):
        raise ValueError("asof_join supports how='left'|'inner'")
    if direction == "nearest":
        return _asof_nearest(left, right, on, by, right_cols, suffix,
                             tolerance, how)
    if direction not in ("backward", "forward"):
        raise ValueError(
            "asof_join direction must be backward|forward|nearest")
    fwd = direction == "forward"
    keys = [by] if isinstance(by, str) else list(by or [])
    rcols = right_cols or [c for c in right.columns
                           if c not in keys and c != on]
    lcols = left.columns
    reserved = {"__ts", "__r", "__side", "__m"}
    clash = reserved & (set(lcols) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join: input columns collide with internal names "
            f"{sorted(clash)}; rename them first")

    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(on).alias("__ts"),
        F.struct(*[F.col(c) for c in rcols], F.col(on).alias("__rts"))
         .alias("__r"),
        F.lit(0).alias("__side"))
    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.col(on).alias("__ts"),
        F.lit(None).cast(r_tag.schema["__r"].dataType).alias("__r"),
        F.lit(1).alias("__side"))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # forward = the mirrored scan: descending ts puts later rows first,
    # so last-non-null over the running frame is the EARLIEST >= match
    order = [F.col("__ts").desc() if fwd else F.col("__ts").asc(),
             F.col("__side")]
    w = (Window.partitionBy(*[F.col(k) for k in keys])
               .orderBy(*order)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = F.last(F.col("__r"), ignorenulls=True).over(w)
    out = (u.withColumn("__m", matched)
            .filter(F.col("__side") == 1))
    if tolerance is not None:
        from pyspark.sql import types as T
        if isinstance(left.schema[on].dataType,
                      (T.TimestampType, T.TimestampNTZType, T.DateType)):
            def tnum(c):     # seconds, so `tolerance` keeps its unit
                return F.expr(f"cast(unix_micros(cast({c} as timestamp))"
                              f" as double) / 1e6")
        else:
            def tnum(c):
                return F.expr(f"cast({c} as double)")
        delta = ((tnum("__m.__rts") - tnum("__ts")) if fwd
                 else (tnum("__ts") - tnum("__m.__rts")))
        out = out.withColumn(
            "__m", F.when(delta <= F.lit(float(tolerance)), F.col("__m")))
    if how == "inner":
        out = out.filter(F.col("__m").isNotNull())
    elif how != "left":
        raise ValueError("asof_join supports how='left'|'inner'")
    sel = [F.col(c) for c in lcols]
    sel += [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in rcols]
    return out.select(*sel)


def _asof_nearest(left, right, on, by, right_cols, suffix, tolerance,
                  how):
    """nearest = backward ∘ forward with a per-row |Δ| comparison; ties
    go to the backward match (pandas semantics). Two keyed window
    passes — still no inequality join anywhere."""
    keys = [by] if isinstance(by, str) else list(by or [])
    rcols = right_cols or [c for c in right.columns
                           if c not in keys and c != on]
    rcols_full = rcols if on in rcols else rcols + [on]
    b = asof_join(left, right, on, by, rcols_full, "__b", tolerance,
                  "left", "backward")
    f = asof_join(b, right, on, by, rcols_full, "__f", tolerance,
                  "left", "forward")
    from pyspark.sql import types as T
    is_ts = isinstance(left.schema[on].dataType,
                       (T.TimestampType, T.TimestampNTZType, T.DateType))

    def num(c):          # timestamp-safe numeric view for |Δ| compare
        if is_ts:
            return F.expr(f"cast(unix_micros(cast(`{c}` as timestamp)) "
                          f"as double)")
        return F.col(c).cast("double")

    ts = num(on)
    bd = ts - num(f"{on}__b")
    fd = num(f"{on}__f") - ts
    use_b = (F.col(f"{on}__b").isNotNull()
             & (F.col(f"{on}__f").isNull() | (bd <= fd)))
    sel = [F.col(c) for c in left.columns]
    # guarantee an <on><suffix> column even if the caller pruned it out
    out_cols = rcols_full
    for c in out_cols:
        sel.append(F.when(use_b, F.col(f"{c}__b"))
                    .otherwise(F.col(f"{c}__f")).alias(f"{c}{suffix}"))
    out = f.select(*sel)
    if how == "inner":
        out = out.filter(F.col(f"{on}{suffix}").isNotNull())
    return out


def range_join(left: DataFrame, right: DataFrame, point_col: str,
               lo_col: str, hi_col: str, bin_width: float,
               how: str = "inner") -> DataFrame:
    """Interval-containment join: left rows matched to right intervals with
    lo <= point <= hi. Spark plans a raw inequality join as a broadcast
    nested loop (per-partition cartesian — unusable at scale); this
    compiles it to an EQUI-join on a bin key instead:

      1. each right interval explodes to the bins it covers
         (ceil(span/bin_width)+1 rows — pick bin_width near the typical
         interval span so replication stays O(1)),
      2. left rows hash-join on their point's bin (one shuffle, AQE/skew
         handling apply as for any equi-join),
      3. an exact containment filter removes same-bin near-misses.

    Inner and left modes (left = unmatched left rows null-filled; the
    unmatched set is computed by anti-joining on a surrogate row id, so
    rows containing NULLs — where equality on all columns is never true —
    are not double-emitted, and duplicate left rows keep their multiplicity).
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"range_join: left/right share column names {sorted(overlap)}; "
            f"rename one side first")
    reserved = {"__bin", "__rid"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"range_join: input columns collide with internal names "
            f"{sorted(clash)}; rename them first")
    bw = float(bin_width)
    lbin = F.floor(F.col(point_col) / bw).cast("long")
    rlo = F.floor(F.col(lo_col) / bw).cast("long")
    rhi = F.floor(F.col(hi_col) / bw).cast("long")
    r_binned = right.withColumn("__bin", F.explode(F.sequence(rlo, rhi)))
    contains = (F.col(point_col) >= F.col(lo_col)) & \
               (F.col(point_col) <= F.col(hi_col))
    if how == "inner":
        l_binned = left.withColumn("__bin", lbin)
        return (l_binned.join(r_binned, on="__bin", how="inner")
                        .filter(contains).drop("__bin"))
    if how != "left":
        raise ValueError("range_join supports how='inner'|'left'")
    # EAGER localCheckpoint pins the nondeterministic row ids before the
    # plan branches: the matched and anti-join branches both read l_id,
    # and without materialization each would recompute
    # monotonically_increasing_id independently — a nondeterministic
    # upstream (sample, round-robin repartition) could then assign
    # different ids per branch, dropping or double-emitting left rows.
    # (eager=False is not enough: concurrent stages can compute a
    # partition twice before its first caching.)
    l_id = left.withColumn("__rid", F.monotonically_increasing_id()) \
               .localCheckpoint(eager=True)
    l_binned = l_id.withColumn("__bin", lbin)
    matched = (l_binned.join(r_binned, on="__bin", how="inner")
                       .filter(contains).drop("__bin"))
    unmatched = l_id.join(matched.select("__rid"), on="__rid",
                          how="left_anti")
    for c in right.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(right.schema[c].dataType))
    return matched.drop("__rid").unionByName(unmatched.drop("__rid"))
