"""Plan compiler: LogicalOp DAG → pyspark DataFrame.

The Spark-first re-expression of the reference's converter layer
(pig:…/executionengine/spark/converter/*.java, SURVEY.md §3.1/§3.4): where
spork hand-converted each physical operator to RDD calls, we *generate* a
declarative DataFrame plan and let Catalyst/Tungsten/AQE pick the physical
strategy. The only optimizations done here are the ones Catalyst cannot see
because they are about plan generation (SURVEY.md §4.1 conclusion):

1. **GROUP+FOREACH fusion (§4.3)** — `FOREACH (GROUP x BY k) GENERATE group,
   AGG(x.f)…` compiles straight to `x.groupBy(k).agg(…)`. This buys partial
   aggregation (the reference's CombinerOptimizer/POPartialAgg), spill, and
   codegen. Bags materialize via collect_list ONLY when they escape.
2. Join strategy hints — `USING 'replicated'` → broadcast(), 'merge' →
   merge hint, 'skewed' → AQE skew join (session conf).
3. Multi-consumer persist — an alias consumed more than once (SPLIT,
   multi-store) is persisted (the reference's MultiQueryOptimizer).
4. Scalable bare RANK — the reference's own POCounter/PORank two-pass
   per-partition-count + prefix-sum design over spark_partition_id, instead
   of a 1-partition global window.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..caching import track
from ..functions.builtins import ALGEBRAIC_AGGS
from ..plans import expressions as E
from ..plans import logical as L
from .expr import ExprCompiler

GROUP_COL = "group"


class PlanCompiler:
    def __init__(self, spark: SparkSession, udfs: dict[str, Any] | None = None,
                 udafs: dict[str, Any] | None = None,
                 partitioners: dict[str, Any] | None = None,
                 warnings=None):
        self.spark = spark
        self.udfs = udfs if udfs is not None else {}
        self.udafs = udafs if udafs is not None else {}
        self.partitioners = partitioners if partitioners is not None else {}
        self.warnings = warnings    # CastWarningCollector | None
        self._cache: dict[int, DataFrame] = {}
        self._consumers: dict[int, int] = {}
        self._persisted: set[int] = set()   # node ids already track()ed

    # ------------------------------------------------------------------ api
    def compile(self, node: L.LogicalOp) -> DataFrame:
        """Compile a plan DAG to a (lazy) DataFrame, memoized per node."""
        return self._compile(node)

    def note_consumers(self, node: L.LogicalOp) -> None:
        """Called at plan-construction time (Engine._rel): consumer counts
        accumulate as the DAG is built, so SPLIT/multi-store sharing is
        visible before the first compile (MultiQueryOptimizer role)."""
        for ch in node.children:
            self._consumers[ch._id] = self._consumers.get(ch._id, 0) + 1

    def _compile(self, node: L.LogicalOp) -> DataFrame:
        if node._id in self._cache:
            # Late persist upgrade: parse-time schema resolution can
            # compile a node before all of its consumers are even
            # constructed (e.g. scalar binding reads .columns while the
            # script is still being parsed), so the >1-consumer persist
            # below is missed at first compile. Reuse is the moment the
            # count is known to have grown — persist() on the cached
            # lazy DataFrame still precedes its first materialization
            # in the batched-store flow, so the computation stays
            # single. Idempotent via _persisted (no storageLevel RPC).
            if (node._id not in self._persisted
                    and self._consumers.get(node._id, 0) > 1
                    and not isinstance(node, (L.Load, L.InMemory))):
                self._cache[node._id] = track(self._cache[node._id])
                self._persisted.add(node._id)
            return self._cache[node._id]
        df = getattr(self, f"_c_{type(node).__name__.lower()}")(node)
        # MultiQueryOptimizer role: persist subplans consumed >1× so SPLIT /
        # multi-store reuse one computation (SURVEY.md §4.2).
        if self._consumers.get(node._id, 0) > 1 and not isinstance(
                node, (L.Load, L.InMemory)):
            # tracked so a resident driver can release the CacheManager
            # entry (caching.release_cached / Engine.release_cache) —
            # an untracked Dataset.persist leaks until session end
            df = track(df)
            self._persisted.add(node._id)
        self._cache[node._id] = df
        return df

    def _ctx(self, df: DataFrame) -> ExprCompiler:
        return ExprCompiler(df, self.udfs, self.udafs,
                            probes=[] if self._warnings_on() else None)

    def _warnings_on(self) -> bool:
        """Cast-failure warning counters (spork_spark/warnings.py),
        default off. Probes are collected per-expression-context and
        attached as observe metrics on the operator's input: FOREACH/
        FILTER expressions (_attach_probes), JOIN/GROUP/COGROUP/
        ORDER/RANK key expressions, fused-aggregate ARGUMENT casts
        (_probe_keys / _agg_arg_casts), and post-agg casts in fused
        generators — wrapping ((long)SUM(x)), interior
        (ROUND((double)SUM(x))), and group-ref ((int)group — the
        keyexpr/remainder projections compile through the probing
        post-agg context, one probe row per group, matching POForEach's
        post-combine evaluation) — via the aggregate/remainder split
        (_split_post_agg). POCast warns at every cast site
        (pig:…/expressionOperators/POCast.java warn()); every site is
        now counted (test_post_agg_group_ref_casts_counted pins the
        fused/nested/de-fused group-ref shapes)."""
        return self.warnings is not None and self._conf(
            "spark.spork.warnings.enabled", "false") == "true"

    def _attach_probes(self, df: DataFrame, ctx: ExprCompiler) -> DataFrame:
        if ctx.probes:
            return self.warnings.attach(df, ctx.probes)
        return df

    def _probe_keys(self, df: DataFrame, keys) -> DataFrame:
        """Plant cast-discard probes for row-level expressions (JOIN/
        GROUP/ORDER keys, fused-aggregate arguments) on the operator's
        INPUT (Pig warns at the local-rearrange / per-row cast, i.e.
        once per input row). Expressions are compiled once in a
        throwaway context so the caller's own compilation never
        double-registers a probe; flag-off returns the input untouched
        (plans stay byte-identical)."""
        if not self._warnings_on() or not keys:
            return df
        kctx = ExprCompiler(df, self.udfs, self.udafs, probes=[])
        for k in keys:
            k = k[0] if isinstance(k, tuple) else k   # (expr, asc) pairs
            kctx.compile(k)
        return self._attach_probes(df, kctx)

    def _split_post_agg(self, e: E.Expr, prefix: str,
                        reserved: set | frozenset = frozenset()) \
            -> tuple[list[tuple[str, E.Expr]], E.Expr] | None:
        """Split a fused generator into (aggregate parts, post-agg
        scalar remainder): each MAXIMAL aggregate-rooted subtree is
        replaced by a Col ref to a temp agg alias. Returns None when
        the generator is a bare aggregate (nothing evaluates post-agg
        — keep the plain fused compile). ``reserved`` holds the group
        key names: a temp named like a key would be ambiguous on the
        aggregated frame."""
        import copy

        base = prefix
        while base in reserved:
            base = f"__post_{base}"
        parts: list[tuple[str, E.Expr]] = []

        def walk(n: E.Expr) -> E.Expr:
            if isinstance(n, E.Func) and (n.name.upper() in ALGEBRAIC_AGGS
                                          or n.name.upper() in self.udafs):
                nm = base if not parts else f"{base}__{len(parts)}"
                parts.append((nm, n))
                return E.Col(nm)
            out = copy.copy(n)
            for k, v in vars(n).items():
                if isinstance(v, E.Expr):
                    setattr(out, k, walk(v))
                elif isinstance(v, list):
                    setattr(out, k, [walk(x) if isinstance(x, E.Expr)
                                     else x for x in v])
            return out

        remainder = walk(e)
        if len(parts) == 1 and isinstance(remainder, E.Col) \
                and remainder.name == parts[0][0]:
            return None                     # bare aggregate — no split
        return parts, remainder

    def _agg_arg_casts(self, e: E.Expr, inside_agg: bool = False,
                       out: list | None = None) -> list:
        """Collect Cast subexpressions that sit INSIDE an aggregate's
        arguments — those evaluate once per input row, so their
        discard probes are row-level (probe-safe on the aggregation
        input). Casts OUTSIDE any aggregate in a fused generator
        evaluate per OUTPUT row and ride the aggregate/remainder split
        instead (_split_post_agg): probed on the aggregated frame,
        one row per group, no aggregate ever nests inside an observe
        metric."""
        if out is None:
            out = []
        if isinstance(e, E.Cast) and inside_agg:
            out.append(e)                  # nested casts each warn
        if isinstance(e, E.Func) and (e.name.upper() in ALGEBRAIC_AGGS
                                      or e.name.upper() in self.udafs):
            inside_agg = True
        for v in vars(e).values():
            if isinstance(v, E.Expr):
                self._agg_arg_casts(v, inside_agg, out)
            elif isinstance(v, list):
                for x in v:
                    if isinstance(x, E.Expr):
                        self._agg_arg_casts(x, inside_agg, out)
        return out

    def _conf(self, key: str, default: str) -> str:
        try:
            return self.spark.conf.get(key, default)
        except Exception:
            return default

    def _side_broadcastable(self, left: DataFrame,
                            right: DataFrame) -> bool:
        """True when Catalyst's size estimate puts either join side
        under spark.sql.autoBroadcastJoinThreshold — i.e. an unhinted
        join would become a BroadcastHashJoin. Estimate errors are
        Catalyst's own (file-size based); a failure to read stats
        answers False (the caller then applies its strategy hint)."""
        try:
            raw = self.spark.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10485760")
            mult = 1
            low = raw.strip().lower()
            for suf, m in (("kb", 1 << 10), ("mb", 1 << 20),
                           ("gb", 1 << 30), ("k", 1 << 10),
                           ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
                if low.endswith(suf):
                    low, mult = low[:-len(suf)], m
                    break
            thr = int(low) * mult
            if thr <= 0:
                return False
            size = min(
                int(str(d._jdf.queryExecution().optimizedPlan()
                        .stats().sizeInBytes()))
                for d in (left, right))
            return size <= thr
        except Exception:
            return False

    # -------------------------------------------------------------- sources
    def _c_load(self, node: L.Load) -> DataFrame:
        from ..sources import read
        return read(self.spark, node.path, node.fmt, node.schema, node.options)

    def _c_inmemory(self, node: L.InMemory) -> DataFrame:
        return node.df

    # -------------------------------------------------------------- row ops
    def _c_filter(self, node: L.Filter) -> DataFrame:
        df = self._compile(node.child)
        ctx = self._ctx(df)
        pred = ctx.compile(node.predicate)
        return self._attach_probes(df, ctx).filter(pred)

    def _c_sample(self, node: L.Sample) -> DataFrame:
        return self._compile(node.child).sample(fraction=node.fraction,
                                                seed=node.seed)

    def _c_limit(self, node: L.Limit) -> DataFrame:
        return self._compile(node.child).limit(node.n)

    def _c_pluck(self, node: L.Pluck) -> DataFrame:
        df = self._compile(node.child)
        keep = [c for c in df.columns if c.startswith(node.prefix)]
        return df.select(*keep)

    def _c_transform(self, node: L.Transform) -> DataFrame:
        return node.fn(self._compile(node.child))

    def _c_distinct(self, node: L.Distinct) -> DataFrame:
        child = self._compile(node.child)
        # Optional pre-shuffle partial-aggregate bypass. Spark's default
        # DISTINCT plan is partial HashAggregate -> exchange -> final:
        # the partial pass pays a full hash-dedup per MAP task, which is
        # pure overhead when keys are mostly unique (zero reduction) or
        # the map side is parallelism-starved (e.g. a single-row-group
        # parquet file scans as ONE task, so the partial agg runs on one
        # core before anything can fan out). Photon/Databricks skip the
        # partial adaptively; OSS Spark has no such rule, so we expose
        # it as a session conf: repartition on all columns first, then
        # dedup — the exchange carries the same rows it would anyway
        # (no reduction was happening), and both aggregate passes run
        # AFTER the exchange at full shuffle parallelism. Default OFF:
        # with heavy duplication the partial agg genuinely shrinks the
        # shuffle and the bypass would hurt — that is a stats call the
        # deployment makes, exactly like Spark's own partial-agg
        # heuristics. Measured at sf0.1 (FLOOR_r05.json): 0.46s -> 0.26s
        # on the single-row-group layout.
        skip_partial = self._conf(
            "spark.spork.distinct.skipPartialAgg", "false") == "true"
        if skip_partial:
            df = child.repartition(*[F.col(c) for c in child.columns]) \
                      .dropDuplicates()
        else:
            df = child.distinct()
        if node.parallel:
            df = df.repartition(node.parallel)
        return df

    # -------------------------------------------------------------- foreach
    def _c_foreach(self, node: L.ForEach) -> DataFrame:
        # The §4.3 fusion: FOREACH over GROUP with purely-algebraic
        # generators compiles to groupBy().agg() — no bag materialization.
        if isinstance(node.child, L.Group) and \
                self._consumers.get(node.child._id, 0) <= 1:
            from .bagfuse import try_fuse_inner_cross
            crossed = try_fuse_inner_cross(self, node.child,
                                           node.generators)
            if crossed is not None:
                return crossed
            fused = self._try_fuse_group_agg(node.child, node.generators)
            if fused is not None:
                return fused
        cg = self._try_fuse_cogroup_agg(node)
        if cg is not None:
            return cg
        df = self._compile(node.child)
        df = self._maybe_repartition_for_windows(df, node.generators)
        return self._apply_generators(df, node.generators)

    def _maybe_repartition_for_windows(self, df: DataFrame,
                                       gens: list[E.Expr]) -> DataFrame:
        """Optional window-input repartition (conf
        `spark.spork.window.repartitionFirst`, default off): when every
        window function in the projection shares one PARTITION BY key
        set, repartition the input on those keys BEFORE the window.

        Why: Spark's WindowGroupLimit rule plants a Partial limit below
        the window's exchange, and that partial pass needs a FULL
        map-side sort. On parallelism-starved inputs (a single-row-group
        parquet file scans as ONE task) that sort runs on one core and
        dominates the query. An explicit repartition on the window keys
        is the SAME single exchange the window would have forced anyway
        (EnsureRequirements sees the distribution satisfied and adds
        none), but the sort + group-limit now run only once, after the
        exchange, at full shuffle parallelism. Measured at sf0.1:
        0.30s -> 0.22s on rank-top-3-per-customer (FLOOR_r05.json).
        Default OFF: when the map side IS wide and keys repeat across
        many input partitions, the partial group-limit genuinely prunes
        shuffle volume — the deployment makes the call, like the
        distinct bypass above.

        Value "range": repartitionByRange on the same keys. Equal keys
        still land in one partition (RangePartitioning bounds are key
        values), so the window's clustering requirement is met by the
        same single exchange — AND the stage's RangePartitioning(keys
        ASC) output satisfies any downstream ORDER BY whose sort order
        starts with the keys ascending (Spark's
        RangePartitioning.satisfies(OrderedDistribution) prefix rule).
        A final `ORDER BY key, ...` then plans as a partition-local
        sort: no second exchange, and — the real win — no range-bound
        sampling pass that would otherwise EXECUTE THE WHOLE WINDOW
        SUBPLAN TWICE (Exchange rangepartitioning samples its child;
        here the sampling runs over the pre-window scan instead).
        Measured at sf1: 0.43 -> 0.35 s on rank-top-3-per-customer.
        Trade-off vs hash: range bounds come from a sampling job over
        the input, and key-value skew skews ranges (hash spreads hot
        ranges of DISTINCT keys better; a single hot KEY is atomic
        either way)."""
        mode = self._conf("spark.spork.window.repartitionFirst", "false")
        if mode not in ("true", "range"):
            return df
        keysets = []

        def walk(e):
            if isinstance(e, E.WindowFunc):
                keysets.append(tuple(repr(p) for p in e.partition_by))
                return
            for f in dataclasses.fields(e) if dataclasses.is_dataclass(e) \
                    else ():
                v = getattr(e, f.name)
                for x in (v if isinstance(v, (list, tuple)) else [v]):
                    if isinstance(x, E.Expr):
                        walk(x)
                    elif isinstance(x, tuple):
                        for y in x:
                            if isinstance(y, E.Expr):
                                walk(y)

        for g in gens:
            walk(g)
        if not keysets or len(set(keysets)) != 1 or not keysets[0]:
            return df
        ctx = self._ctx(df)
        first = next(e for e in self._iter_windowfuncs(gens))
        try:
            keys = [ctx.compile(p) for p in first.partition_by]
        except Exception:
            return df
        if mode == "range":
            return df.repartitionByRange(*keys)
        return df.repartition(*keys)

    def _iter_windowfuncs(self, gens):
        def it(e):
            if isinstance(e, E.WindowFunc):
                yield e
                return
            if dataclasses.is_dataclass(e):
                for f in dataclasses.fields(e):
                    v = getattr(e, f.name)
                    for x in (v if isinstance(v, (list, tuple)) else [v]):
                        if isinstance(x, E.Expr):
                            yield from it(x)
                        elif isinstance(x, tuple):
                            for y in x:
                                if isinstance(y, E.Expr):
                                    yield from it(y)
        for g in gens:
            yield from it(g)

    def _apply_generators(self, df: DataFrame, gens: list[E.Expr]) -> DataFrame:
        """Plain projection path, incl. FLATTEN via explode/struct-expand."""
        ctx = self._ctx(df)
        cols, flatten_names = [], []
        for i, g in enumerate(gens):
            alias = None
            inner = g
            if isinstance(inner, E.Aliased):
                alias, inner = inner.name, inner.child
            if isinstance(inner, E.Star):
                cols.append(F.col("*"))
                continue
            if isinstance(inner, E.RangeProj):
                cols.extend(F.col(c) for c in
                            self._expand_range(df.columns, inner))
                continue
            if isinstance(inner, E.Flatten):
                name = alias if isinstance(alias, str) else f"__flat_{i}"
                cols.append(ctx.compile(inner.child).alias(name))
                flatten_names.append((name, alias))
                continue
            if isinstance(alias, tuple):
                raise ValueError(
                    "AS (a, b, …) multi-name aliases apply to FLATTEN "
                    "generators only")
            c = ctx.compile(inner)
            cols.append(c.alias(alias) if alias else
                        c.alias(self._default_name(inner, i)))
        out = self._attach_probes(df, ctx).select(*cols)
        for name, alias in flatten_names:
            out = self._explode_one(out, name, alias)
        return out

    def _expand_star_keys(self, df: DataFrame,
                          keys: list[E.Expr]) -> list[E.Expr]:
        """GROUP/ORDER BY * (and project-ranges) expand to per-column keys
        against the input schema — Pig's whole-tuple key."""
        out: list[E.Expr] = []
        for k in keys:
            if isinstance(k, E.Star):
                out.extend(E.Col(c) for c in df.columns)
            elif isinstance(k, E.RangeProj):
                out.extend(E.Col(c) for c in
                           self._expand_range(df.columns, k))
            else:
                out.append(k)
        return out

    @staticmethod
    def _expand_range(columns: list[str], r: E.RangeProj) -> list[str]:
        """Expand a project-range ``a .. c`` positionally against the input
        schema (Pig 0.9 project-range; bounds inclusive, open ends allowed)."""
        def idx(bound, default):
            if bound is None:
                return default
            if isinstance(bound, int):
                if bound >= len(columns):
                    raise ValueError(
                        f"range bound ${bound} out of range "
                        f"({len(columns)} columns)")
                return bound
            try:
                return columns.index(bound)
            except ValueError:
                raise ValueError(f"unknown column {bound!r} in range "
                                 f"projection over {columns}") from None
        lo, hi = idx(r.start, 0), idx(r.end, len(columns) - 1)
        if lo > hi:
            raise ValueError(f"empty range projection "
                             f"({r.start!r} .. {r.end!r})")
        return columns[lo:hi + 1]

    @staticmethod
    def _default_name(e: E.Expr, i: int) -> str:
        if isinstance(e, E.Col):
            return e.name.split(".")[-1].split("::")[-1]
        if isinstance(e, E.Deref) and isinstance(e.field, str):
            return e.field
        return f"col_{i}"

    def _explode_one(self, df: DataFrame, name: str,
                     alias: str | tuple | None) -> DataFrame:
        """FLATTEN semantics (SURVEY.md §2.2): bag → cross product with the
        row, EMPTY/NULL BAG DROPS THE ROW (explode, not explode_outer);
        tuple → inline fields; map → key/value rows. ``AS name`` renames a
        single flattened field; ``AS (a, b, …)`` renames them all."""
        dt = df.select(name).schema[0].dataType
        # flattened fields replace the bag column AT ITS POSITION (Pig's
        # output ordering), not appended at the end
        idx = df.columns.index(name)
        before, after = df.columns[:idx], df.columns[idx + 1:]

        def placed(*inner):
            return df.select(*before, *inner, *after)
        if isinstance(dt, T.ArrayType):
            if isinstance(alias, tuple) and \
                    not isinstance(dt.elementType, T.StructType):
                # FLATTEN(tuple-valued) AS (a, b): Pig's STRSPLIT-style
                # dynamic-arity tuple is an array here; the AS names declare
                # the arity, so inline elements as columns (no row fan-out).
                return placed(*[F.col(name)[i].alias(a)
                                for i, a in enumerate(alias)])
            df = df.withColumn(name, F.explode(F.col(name)))
            dt = dt.elementType
        if isinstance(dt, T.StructType):
            fields = dt.fields
            if isinstance(alias, tuple):
                if len(alias) != len(fields):
                    raise ValueError(
                        f"FLATTEN AS names {len(alias)} fields but the "
                        f"value has {len(fields)}")
                names = list(alias)
            elif alias is not None and len(fields) == 1:
                names = [alias]
            else:
                names = [f.name for f in fields]
            return placed(*[F.col(f"{name}.{f.name}").alias(n)
                            for f, n in zip(fields, names)])
        if isinstance(dt, T.MapType):
            knames = alias if isinstance(alias, tuple) and len(alias) == 2 \
                else ("key", "value")
            return placed(F.explode(F.col(name)).alias(*knames))
        # scalar array element / passthrough
        if isinstance(alias, str) and name != alias:
            # deferred-flatten path carries a temp bag name through the join
            df = df.withColumnRenamed(name, alias)
        elif alias is None and name.startswith("__flat_"):
            df = df.withColumnRenamed(name, name.removeprefix("__flat_"))
        return df

    # ------------------------------------------------------- group & fusion
    def _group_key_cols(self, ctx: ExprCompiler, keys: list[E.Expr]) -> list:
        cols = []
        for i, k in enumerate(keys):
            name = k.name if isinstance(k, E.Col) else \
                (k.name if isinstance(k, E.Aliased) else f"group_{i}")
            cols.append(ctx.compile(k).alias(name))
        return cols

    def _try_fuse_group_agg(self, group: L.Group,
                            gens: list[E.Expr]) -> DataFrame | None:
        """Pattern-match FOREACH(GROUP) generators; None ⇒ bag escapes.

        A generator is fusable when it is (a) a reference to `group` (whole
        key or key field), or (b) an algebraic aggregate whose arguments
        only dereference the bag. Anything else (FLATTEN of the bag, the
        bag itself, non-algebraic fns) falls back to materialization.
        """
        child_df = None
        if isinstance(group.child, L.Join) and group.mode == "by" and \
                self._consumers.get(group.child._id, 0) <= 1 and \
                self._conf("spark.spork.optimizer.eagerAgg",
                           "true") == "true":
            eager = self._try_eager_agg(group, gens)
            if eager is not None:
                child_df, gens = eager
        if child_df is None:
            child_df = self._compile(group.child)
        ctx = self._ctx(child_df)
        keys = self._expand_star_keys(child_df, group.keys)
        from .bagfuse import try_fuse_topk
        topk = try_fuse_topk(self, group, gens, child_df, ctx, keys)
        if topk is not None:
            child_df, gens = topk
            ctx = self._ctx(child_df)
        # Same-column PERCENTILEs fuse into one shared buffer (map
        # computed over all generators; compiled per-node in _c_func)
        if self._conf("spark.spork.optimizer.fusePercentiles",
                      "true") == "true":
            pm = self._percentile_fusion_map(
                gens, child_df.columns[0] if child_df.columns else None)
            if pm:
                ctx.pctl_multi = pm
        # an agg output named like a group key would be ambiguous on
        # the aggregated frame — such columns compute under a safe
        # name and alias back in the final projection
        key_names = {self._key_name(k, i) for i, k in enumerate(keys)}
        agg_cols, out_cols, saw_agg = [], [], False
        row_casts: list[E.Expr] = []       # casts inside aggregate args

        for i, g in enumerate(gens):
            alias, inner = None, g
            if isinstance(inner, E.Aliased):
                alias, inner = inner.name, inner.child
            inner = self._normalize_distinct_agg(
                inner, child_df.columns[0] if child_df.columns else None)
            kind = self._classify_generator(inner, keys)
            if kind == "group":
                out_cols.append(("group", inner, alias))
            elif kind == "agg":
                # Casts OUTSIDE the aggregates ((long)SUM(x),
                # ROUND((double)SUM(x))) evaluate per OUTPUT row; a
                # discard probe there would nest an aggregate in the
                # observe metric (illegal). With warnings on, split the
                # generator: each maximal aggregate subtree compiles
                # into the agg under a temp alias, the scalar remainder
                # re-applies in the post-agg projection where its cast
                # probes see one row per group — POCast warns at the
                # cast site, post-combine. Flag-off plans keep the
                # single fused expression (byte-identical).
                name = alias or f"col_{i}"
                first = child_df.columns[0] if child_df.columns else None
                split = self._split_post_agg(inner, name, key_names) \
                    if self._warnings_on() else None
                if split is not None:
                    parts, remainder = split
                    for tmp, sub in parts:
                        rw = self._rewrite_bag_refs(sub, first)
                        agg_cols.append((ctx.compile(rw).alias(tmp), tmp,
                                         self._mentions_udaf(rw)))
                        row_casts.extend(self._agg_arg_casts(rw))
                    out_cols.append(("post", (remainder, name), None))
                    saw_agg = True
                    continue
                rewritten = self._rewrite_bag_refs(inner, first)
                safe = name
                while safe in key_names:
                    safe = f"__post_{safe}"
                col = ctx.compile(rewritten).alias(safe)
                agg_cols.append((col, safe, self._mentions_udaf(rewritten)))
                out_cols.append(("agg", (safe, name), None))
                saw_agg = True
                if self._warnings_on():
                    row_casts.extend(self._agg_arg_casts(rewritten))
            elif kind == "keyexpr":
                out_cols.append(("post", (inner, alias or f"col_{i}"),
                                 None))
            else:
                # MIXED generator — scalar over keys AND aggregates in
                # one expression (CONCAT((chararray)group, ':',
                # (chararray)COUNT(x))): split the aggregates into the
                # agg and evaluate the remainder post-agg. Without
                # this, one such generator de-fuses the whole FOREACH.
                name = alias or f"col_{i}"
                first = child_df.columns[0] if child_df.columns else None
                split = self._split_post_agg(inner, name, key_names)
                if split is None:
                    return None
                parts, remainder = split
                if not parts \
                        or any(not self._is_algebraic_agg(p)
                               for _, p in parts) \
                        or not self._is_key_scalar(
                            remainder, keys, extra={p[0] for p in parts}):
                    return None
                for tmp, sub in parts:
                    rw = self._rewrite_bag_refs(sub, first)
                    agg_cols.append((ctx.compile(rw).alias(tmp), tmp,
                                     self._mentions_udaf(rw)))
                    if self._warnings_on():
                        row_casts.extend(self._agg_arg_casts(rw))
                out_cols.append(("post", (remainder, name), None))
                saw_agg = True
        if not saw_agg:
            return None

        # Cast discards in the fused plan ride the aggregation input,
        # where the rows still exist per-input-row: group-KEY casts +
        # casts inside aggregate ARGUMENTS (SUM((int)x)) — both
        # compiled once in a throwaway probe context. Post-agg casts
        # (wrapping, interior, and group-ref — keyexpr generators and
        # split remainders alike) compile through post_ctx below and
        # probe on the aggregated frame, one row per group.
        child_df = self._probe_keys(child_df, keys)
        child_df = self._probe_keys(child_df, row_casts)
        agg_df = self._grouped_agg(group, child_df, ctx, keys, agg_cols)

        # Re-project to the requested generator shape/order. Split
        # post-agg scalar remainders re-compile here through a
        # probe-collecting context on the aggregated frame (one probe
        # row per group).
        post_ctx = self._ctx(agg_df)
        final = []
        for kind, payload, alias in out_cols:
            if kind == "agg":
                safe, name = payload
                final.append(F.col(safe).alias(name) if safe != name
                             else F.col(name))
            elif kind == "post":
                expr_e, name = payload
                rewritten = self._rewrite_key_refs(expr_e, keys)
                final.append(post_ctx.compile(rewritten).alias(name))
            else:
                final.append(self._compile_group_ref(payload, keys, alias,
                                                     agg_df))
        result = self._attach_probes(agg_df, post_ctx).select(*final)
        if getattr(group, "partitioner", None):
            key_cols = self._partitioner_key_cols(out_cols, keys,
                                                  result.columns)
            if key_cols is not None:
                placed = self._apply_partitioner(group, result, key_cols)
                if placed is not None:
                    result = placed
            else:
                import warnings
                warnings.warn(
                    "PARTITION BY: the full group key is not projected by "
                    "the FOREACH generators; custom placement skipped")
        return result

    def _partitioner_key_cols(self, out_cols, keys,
                              result_columns) -> list[str] | None:
        """Output columns carrying the group key for custom placement, in
        DECLARED key order (the getPartition contract — projection order
        must not leak into the key shape). A whole-`group` projection is
        the key itself (struct fields already in declared order); per-
        field derefs qualify only when together they cover every declared
        key. Returns None when the key cannot be reconstructed."""
        field_pos: dict[int, int] = {}        # declared key idx → out idx
        key_names = [self._key_name(k, i) for i, k in enumerate(keys)]
        for i, (kind, payload, _alias) in enumerate(out_cols):
            if kind != "group":
                continue
            if isinstance(payload, E.Col):     # whole `group`
                return [result_columns[i]]
            fld = payload.field
            idx = fld if isinstance(fld, int) else (
                key_names.index(fld) if fld in key_names else None)
            if idx is not None and idx not in field_pos:
                field_pos[idx] = i
        if len(field_pos) != len(keys):
            return None
        return [result_columns[field_pos[i]] for i in range(len(keys))]

    _EAGER_AGGS = {"SUM", "COUNT", "COUNT_STAR", "MIN", "MAX", "AVG"}
    _EAGER_FINAL = {"SUM": "SUM", "COUNT": "SUM", "COUNT_STAR": "SUM",
                    "MIN": "MIN", "MAX": "MAX"}

    def _try_eager_agg(self, group: L.Group, gens: list[E.Expr]):
        """Eager aggregation (Yan & Larson, VLDB'95) — an optimization
        Catalyst does NOT perform: for FOREACH (GROUP (JOIN …) BY k)
        GENERATE … AGG(fact.field) …, pre-aggregate the fact side by its
        join key BEFORE the join, then finalize after. The exchange then
        carries one partial row per join key instead of every fact row —
        the reference's combiner idea extended through the join
        (pig:…/mapReduceLayer/CombinerOptimizer.java is the per-group
        analogue). Legal for SUM/COUNT/COUNT_STAR/MIN/MAX under INNER
        joins: join multiplicity scales partial sums exactly as it scales
        raw rows, and min/max are multiplicity-invariant.

        Returns (joined-with-partials DataFrame, rewritten generators) or
        None when the shape doesn't apply (the normal fusion path runs).
        """
        # -- collect the aggregates and their field references ------------
        aggs: list[tuple[E.Func, str, str | None]] = []   # (node, fn, field)

        def walk(e):
            if isinstance(e, E.Func):
                name = e.name.upper()
                if name in ALGEBRAIC_AGGS or name in self.udafs:
                    if name not in self._EAGER_AGGS:
                        return False          # AVG/VAR/UDAF…: not eager
                    if name == "COUNT_STAR" and len(e.args) == 0:
                        aggs.append((e, name, None))
                        return True
                    if len(e.args) == 1 and isinstance(e.args[0], E.Deref) \
                            and isinstance(e.args[0].field, str):
                        aggs.append((e, name, e.args[0].field))
                        return True
                    return False              # COUNT(bag)/odd shapes: bail
            for v in vars(e).values():
                if isinstance(v, E.Expr) and not walk(v):
                    return False
                if isinstance(v, list) and not all(
                        walk(x) for x in v if isinstance(x, E.Expr)):
                    return False
            return True

        for g in gens:
            if not walk(g.child if isinstance(g, E.Aliased) else g):
                return None
        fields = {f for _, _, f in aggs if f is not None}
        if not fields:
            return None                       # nothing pins a fact side
        key_refs = set()
        for k in group.keys:
            key_refs.update(self._expr_col_refs(k))

        # -- locate the fact input on the inner-join spine ----------------
        def cols_of(node):
            return set(self._compile(node).columns)

        def find(node, above_sibling_cols):
            """Descend binary inner joins; returns (ancestors, target,
            target_keys) — ancestors = [(join_node, side_of_target)] from
            this level down."""
            if not isinstance(node, L.Join) or len(node.inputs) != 2 or \
                    node.how != "inner" or \
                    self._consumers.get(node._id, 0) > 1:
                return None
            a, b = node.inputs
            acols, bcols = cols_of(a), cols_of(b)
            if acols & bcols:
                return None                   # collision renames: keep simple
            for side, tgt, tcols, sib in ((1, b, bcols, acols),
                                          (0, a, acols, bcols)):
                if not fields <= tcols:
                    continue
                if key_refs & tcols:
                    return None               # group key needs fact columns
                if above_sibling_cols & tcols:
                    return None               # upper join keys touch fact
                tkeys = node.keys[side]
                if not all(isinstance(k, E.Col) for k in tkeys):
                    return None
                # sibling-side keys at this level must avoid fact columns
                sib_refs = set()
                for k in node.keys[1 - side]:
                    sib_refs.update(self._expr_col_refs(k))
                if sib_refs & tcols:
                    return None
                if side == 0 and isinstance(tgt, L.Join):
                    deeper = find(tgt, above_sibling_cols | {
                        r for k in node.keys[0]
                        for r in self._expr_col_refs(k)})
                    if deeper is not None:
                        anc, t, tk = deeper
                        return ([(node, 0)] + anc, t, tk)
                return ([(node, side)], tgt, tkeys)
            return None

        found = find(group.child, set())
        if found is None:
            return None
        ancestors, target, tkeys = found

        # -- pre-aggregate the fact side by its join key ------------------
        tdf = self._compile(target)
        key_names = [k.name for k in tkeys]
        if not set(key_names) <= set(tdf.columns):
            return None
        partial_of: dict[tuple, str] = {}
        partials = []

        def partial(sig, make):
            if sig not in partial_of:
                pname = f"__ea_{len(partial_of)}"
                partial_of[sig] = pname
                partials.append(make().alias(pname))
            return partial_of[sig]

        for _, fname, field in aggs:
            if fname == "SUM":
                partial((fname, field), lambda: F.sum(field))
            elif fname == "COUNT":
                partial((fname, field), lambda: F.count(field))
            elif fname == "COUNT_STAR":
                partial((fname, field), lambda: F.count(F.lit(1)))
            elif fname == "MIN":
                partial((fname, field), lambda: F.min(field))
            elif fname == "MAX":
                partial((fname, field), lambda: F.max(field))
            else:   # AVG decomposes to sum+count partials
                partial(("SUM", field), lambda: F.sum(field))
                partial(("COUNT", field), lambda: F.count(field))
        pre = tdf.groupBy(*[F.col(k) for k in key_names]).agg(*partials)

        # -- rebuild the join chain with the fact side swapped ------------
        new_node = L.InMemory(pre)
        new_node.alias = getattr(target, "alias", None)
        for node, side in reversed(ancestors):
            inputs = list(node.inputs)
            inputs[side] = new_node
            nj = L.Join(inputs, [list(ks) for ks in node.keys],
                        node.how, node.strategy, node.parallel)
            nj.alias = getattr(node, "alias", None)
            new_node = nj

        # -- rewrite generators onto the partial columns ------------------
        def rewrite(e):
            if isinstance(e, E.Func):
                name = e.name.upper()
                sig = None
                if name == "COUNT_STAR" and len(e.args) == 0:
                    sig = (name, None)
                elif name in self._EAGER_AGGS and len(e.args) == 1 and \
                        isinstance(e.args[0], E.Deref) and \
                        isinstance(e.args[0].field, str):
                    sig = (name, e.args[0].field)
                if sig is not None:
                    if name == "AVG":
                        # AVG = SUM(partial sums) / SUM(partial counts);
                        # the double cast defeats Pig's truncating integer
                        # '/' when the field is integral (AVG returns
                        # double for int/long inputs — SURVEY.md §2.4)
                        ssum = E.Cast("double", E.Func(
                            "SUM", [E.Col(partial_of[("SUM", sig[1])])]))
                        scnt = E.Func(
                            "SUM", [E.Col(partial_of[("COUNT", sig[1])])])
                        return E.BinOp("/", ssum, scnt)
                    if sig in partial_of:
                        return E.Func(self._EAGER_FINAL[name],
                                      [E.Col(partial_of[sig])])
                return E.Func(e.name, [rewrite(a) if isinstance(a, E.Expr)
                                       else a for a in e.args])
            if isinstance(e, E.Aliased):
                return E.Aliased(rewrite(e.child), e.name)
            if isinstance(e, E.BinOp):
                return E.BinOp(e.op, rewrite(e.left), rewrite(e.right))
            if isinstance(e, E.Cast):
                return E.Cast(e.pig_type, rewrite(e.child))
            return e

        return self._compile(new_node), [rewrite(g) for g in gens]

    def _grouped_agg(self, group: L.Group, child_df: DataFrame,
                     ctx: ExprCompiler, keys: list[E.Expr],
                     agg_cols: list[tuple]) -> DataFrame:
        """One groupBy().agg() — unless the generators mix grouped-agg
        pandas UDAFs with JVM aggregates, which Spark forbids in a single
        Aggregate (INVALID_PANDAS_UDF_PLACEMENT). Then: two aggregations
        over the same child, null-safe-joined on the keys. Both sides hash-
        partition by the same keys, so Catalyst reuses the exchange and the
        join is co-partitioned — no extra shuffle of the input."""
        if group.mode == "gsets":
            # groupingSets matches set members to grouping columns by
            # expression equality — aliased copies don't match (all-null
            # keys), so group on raw expressions and rename afterward.
            if any(u for _, _, u in agg_cols):
                raise NotImplementedError(
                    "custom aggregate (register_udaf) cannot be combined "
                    "with mixed CUBE/ROLLUP grouping sets")
            raw = [ctx.compile(k) for k in keys]
            sets = [[raw[i] for i in s] for s in group.gsets]
            out = child_df.groupingSets(sets, *raw) \
                          .agg(*[c for c, _, _ in agg_cols])
            names = [self._key_name(k, i) for i, k in enumerate(keys)]
            for old, new in zip(out.columns[:len(names)], names):
                if old != new:
                    out = out.withColumnRenamed(old, new)
            return out

        def grouped():
            if group.mode == "all":
                return child_df.groupBy()
            if group.mode == "cube":
                return child_df.cube(*self._group_key_cols(ctx, keys))
            if group.mode == "rollup":
                return child_df.rollup(*self._group_key_cols(ctx, keys))
            return child_df.groupBy(*self._group_key_cols(ctx, keys))

        native = [(c, n) for c, n, u in agg_cols if not u]
        pandas_ = [(c, n) for c, n, u in agg_cols if u]
        if not native or not pandas_:
            return grouped().agg(*[c for c, _, _ in agg_cols])
        if group.mode in ("cube", "rollup", "gsets"):
            raise NotImplementedError(
                "custom aggregate (register_udaf) cannot be combined with "
                "builtin aggregates under CUBE/ROLLUP — grouping-set null "
                "rows are ambiguous join keys across the split aggregation")
        if group.mode == "all":
            return (child_df.groupBy().agg(*[c for c, _ in native])
                    .crossJoin(child_df.groupBy()
                               .agg(*[c for c, _ in pandas_])))
        # Each side plans independently: the native side keeps map-side
        # partial aggregation (tiny shuffle), the pandas side shuffles only
        # its pruned columns. The input is scanned twice, but each scan is
        # column-pruned — together ≈ one unpruned scan. (A shared
        # repartition would merge the scans but forfeit the combine and
        # shuffle raw rows twice — measured worse.) The reference charges
        # non-Algebraic UDFs a comparable toll: no combiner, full bags to
        # the reducer (pig:…/mapReduceLayer/CombinerOptimizer.java).
        a = grouped().agg(*[c for c, _ in native])
        b = grouped().agg(*[c for c, _ in pandas_])
        knames = a.columns[:len(self._group_key_cols(ctx, keys))]
        cond = None
        for k in knames:
            c = a[k].eqNullSafe(b[k])
            cond = c if cond is None else (cond & c)
        return a.join(b, cond).select(
            *[a[k] for k in knames],
            *[a[n] for _, n in native], *[b[n] for _, n in pandas_])

    def _mentions_udaf(self, e: E.Expr) -> bool:
        if isinstance(e, E.Func) and e.name.upper() in self.udafs:
            return True
        for v in vars(e).values():
            if isinstance(v, E.Expr) and self._mentions_udaf(v):
                return True
            if isinstance(v, list) and any(
                    isinstance(x, E.Expr) and self._mentions_udaf(x)
                    for x in v):
                return True
        return False

    def _compile_group_ref(self, e: E.Expr, keys: list[E.Expr],
                           alias: str | None, agg_df: DataFrame):
        """Compile a reference to the group key in the fused plan."""
        key_names = [k.name if isinstance(k, E.Col) else
                     (k.name if isinstance(k, E.Aliased) else f"group_{i}")
                     for i, k in enumerate(keys)]
        if isinstance(e, E.Col) and e.name == GROUP_COL:
            if not keys:                       # GROUP ALL → group = 'all'
                return F.lit("all").alias(alias or GROUP_COL)
            if len(keys) == 1:
                return F.col(key_names[0]).alias(alias or GROUP_COL)
            return F.struct(*[F.col(n) for n in key_names]) \
                    .alias(alias or GROUP_COL)
        if isinstance(e, E.Deref) and isinstance(e.child, E.Col) \
                and e.child.name == GROUP_COL:
            name = e.field if isinstance(e.field, str) else key_names[e.field]
            return F.col(name).alias(alias or name)
        raise AssertionError("unreachable: classified as group ref")

    def _classify_generator(self, e: E.Expr, keys: list[E.Expr]) -> str:
        if isinstance(e, E.Col) and e.name == GROUP_COL:
            return "group"
        if isinstance(e, E.Deref) and isinstance(e.child, E.Col) \
                and e.child.name == GROUP_COL:
            return "group"
        if self._is_algebraic_agg(e):
            return "agg"
        if self._is_key_scalar(e, keys):
            return "keyexpr"
        return "other"

    def _is_key_scalar(self, e: E.Expr, keys: list[E.Expr],
                       extra: frozenset | set = frozenset()) -> bool:
        """True for a scalar expression over group-KEY references,
        literals, and scalar functions only — (chararray)group,
        group.a + 1, CONCAT(group.a, '-') — which evaluates post-agg
        from the key columns. Without this, one cast on the group key
        de-fuses the whole FOREACH into collect_list materialization:
        the worst possible trade for the commonest key idiom. A
        whole-`group` ref qualifies only under zero keys (GROUP ALL →
        'all') or a single key; a multi-key struct rebuild is left to
        the unfused path."""
        def ok(n: E.Expr) -> bool:
            if isinstance(n, E.Col):
                if n.name in extra:       # split-out aggregate temp col
                    return True
                return n.name == GROUP_COL and len(keys) <= 1
            if isinstance(n, E.Deref):
                if not (isinstance(n.child, E.Col)
                        and n.child.name == GROUP_COL):
                    return False
                # positional key deref must be in range (group.$5 with
                # 2 keys falls back to the unfused path's own error)
                return not isinstance(n.field, int) or n.field < len(keys)
            if isinstance(n, E.Lambda) or isinstance(n, E.Star):
                return False
            if isinstance(n, E.Func):
                nm = n.name.upper()
                if nm in ALGEBRAIC_AGGS or nm in self.udafs \
                        or nm in self._HOF_NAMES:
                    return False
            for v in vars(n).values():
                if isinstance(v, E.Expr) and not ok(v):
                    return False
                if isinstance(v, list) and any(
                        isinstance(x, E.Expr) and not ok(x) for x in v):
                    return False
            return True

        return ok(e)

    def _rewrite_key_refs(self, e: E.Expr, keys: list[E.Expr]) -> E.Expr:
        """Rewrite group-key references in a keyexpr generator to the
        aggregated frame's key columns (GROUP ALL → the literal
        'all')."""
        import copy

        key_names = [self._key_name(k, i) for i, k in enumerate(keys)]

        def walk(n: E.Expr) -> E.Expr:
            if isinstance(n, E.Col) and n.name == GROUP_COL:
                return E.Col(key_names[0]) if keys else E.Lit("all")
            if isinstance(n, E.Deref) and isinstance(n.child, E.Col) \
                    and n.child.name == GROUP_COL:
                fld = n.field
                return E.Col(fld if isinstance(fld, str)
                             else key_names[fld])
            out = copy.copy(n)
            for k, v in vars(n).items():
                if isinstance(v, E.Expr):
                    setattr(out, k, walk(v))
                elif isinstance(v, list):
                    setattr(out, k, [walk(x) if isinstance(x, E.Expr)
                                     else x for x in v])
            return out

        return walk(e)

    _HOF_NAMES = {"FILTER_BAG", "TRANSFORM_BAG", "FOREACH_BAG", "SORT_BAG",
                  "LIMIT_BAG", "DISTINCT_BAG", "CROSS_BAG", "TOP"}

    _DISTINCT_FUSABLE = {"COUNT": "COUNT_DISTINCT", "SUM": "SUM_DISTINCT"}

    def _normalize_distinct_agg(self, e: E.Expr,
                                first_col: str | None = None) -> E.Expr:
        """Pig's nested-DISTINCT idiom — FOREACH (GROUP x BY k) { d =
        DISTINCT x.f; GENERATE COUNT(d) } (PigMix L4/L15) — arrives as
        AGG(DISTINCT_BAG(bag.f)). Rewrite to the distinct-aggregate form
        (COUNT_DISTINCT/SUM_DISTINCT) so it fuses into groupBy().agg()
        and gets Catalyst's expand + two-phase partial aggregation instead
        of materializing and deduplicating per-group bags — the same
        motivation as the reference's CombinerOptimizer (SURVEY.md §4.3)."""
        if (isinstance(e, E.Func) and e.name.upper() in self._DISTINCT_FUSABLE
                and len(e.args) == 1 and isinstance(e.args[0], E.Func)
                and e.args[0].name.upper() == "DISTINCT_BAG"
                and len(e.args[0].args) == 1
                and isinstance(e.args[0].args[0], (E.Deref, E.Col))):
            return E.Func(self._DISTINCT_FUSABLE[e.name.upper()],
                          [e.args[0].args[0]])
        filt = self._normalize_filter_agg(e, first_col)
        if filt is not None:
            return filt
        if isinstance(e, E.Func):
            return E.Func(e.name,
                          [self._normalize_distinct_agg(a, first_col)
                           for a in e.args])
        if isinstance(e, E.BinOp):
            return E.BinOp(e.op,
                           self._normalize_distinct_agg(e.left, first_col),
                           self._normalize_distinct_agg(e.right, first_col))
        if isinstance(e, E.Cast):
            return E.Cast(e.pig_type,
                          self._normalize_distinct_agg(e.child, first_col))
        return e

    _FILTER_FUSABLE = {"COUNT", "COUNT_STAR", "SUM", "AVG", "MIN", "MAX"}

    def _normalize_filter_agg(self, e: E.Expr,
                              first_col: str | None = None) -> E.Expr | None:
        """The inner-FILTER aggregate idiom — FOREACH (GROUP x BY k) { f =
        FILTER x BY cond; GENERATE SUM(f.v) } — arrives as
        AGG(FILTER_BAG(bag, λ)[.field]). Rewrite to AGG(when(cond, v)):
        the filter fuses into the aggregate (SURVEY.md §2.3 mapping #2) so
        the whole generator compiles to groupBy().agg() with map-side
        partial aggregation — no bag ever materializes. Returns None when
        the pattern doesn't apply (caller falls through)."""
        if not (isinstance(e, E.Func) and e.name.upper() in
                self._FILTER_FUSABLE and len(e.args) == 1):
            return None
        a, fb, field = e.args[0], None, None
        if isinstance(a, E.Func) and a.name.upper() == "FILTER_BAG":
            fb = a
        elif isinstance(a, E.Deref) and isinstance(a.child, E.Func) \
                and a.child.name.upper() == "FILTER_BAG" \
                and isinstance(a.field, str):
            fb, field = a.child, a.field
        if fb is None or len(fb.args) != 2 \
                or not isinstance(fb.args[0], E.Col) \
                or not isinstance(fb.args[1], E.Lambda) \
                or len(fb.args[1].params) != 1:
            return None
        if field is None and e.name.upper() not in ("COUNT", "COUNT_STAR"):
            return None                      # SUM(bag) etc. needs a field
        cond = self._delambda(fb.args[1].body, fb.args[1].params[0])
        if cond is None:
            return None
        if e.name.upper() == "COUNT_STAR":
            # COUNT_STAR(filtered bag) counts EVERY tuple passing the
            # filter (nulls included) → COUNT of when(cond, 1): rows
            # failing the filter become null and drop out of the count
            return E.Func("COUNT", [E.BinCond(cond, E.Lit(1), E.Lit(None))])
        # bare COUNT(filtered bag): Pig counts tuples whose FIRST field is
        # non-null, so count the first column under the condition — not a
        # literal 1 (which would count null-first-field rows too)
        val = (E.Col(first_col) if field is None and first_col is not None
               else E.Lit(1) if field is None else E.Col(field))
        return E.Func(e.name, [E.BinCond(cond, val, E.Lit(None))])

    def _delambda(self, e: E.Expr, param: str) -> E.Expr | None:
        """Rewrite a lambda body into a row-level expression: t.f → Col(f).
        Returns None if the body uses the tuple var other than via a named
        field deref (positional/whole-tuple uses keep the bag path)."""
        if isinstance(e, E.Deref) and isinstance(e.child, E.LambdaVar) \
                and e.child.name == param and isinstance(e.field, str):
            return E.Col(e.field)
        if isinstance(e, (E.LambdaVar, E.Lambda)):
            return None
        if isinstance(e, (E.Lit, E.Col, E.Pos, E.Star, E.RangeProj)):
            return e
        out = e.__class__(**{k: v for k, v in vars(e).items() if k != "_id"})
        for k, v in vars(out).items():
            if k == "_id":
                continue
            if isinstance(v, E.Expr):
                sub = self._delambda(v, param)
                if sub is None:
                    return None
                setattr(out, k, sub)
            elif isinstance(v, list):
                subs = []
                for x in v:
                    if isinstance(x, E.Expr):
                        sx = self._delambda(x, param)
                        if sx is None:
                            return None
                        subs.append(sx)
                    else:
                        subs.append(x)
                setattr(out, k, subs)
        return out

    def _contains_inner_plan(self, e: E.Expr) -> bool:
        """Nested-FOREACH constructs (bag HOFs / lambdas) can't fuse into
        groupBy().agg() — they need the materialized bag."""
        if isinstance(e, E.Lambda):
            return True
        if isinstance(e, E.Func) and e.name.upper() in self._HOF_NAMES:
            return True
        for v in vars(e).values():
            if isinstance(v, E.Expr) and self._contains_inner_plan(v):
                return True
            if isinstance(v, list) and any(
                    isinstance(x, E.Expr) and self._contains_inner_plan(x)
                    for x in v):
                return True
        return False

    def _is_algebraic_agg(self, e: E.Expr) -> bool:
        """True if e is AGG(args…) over bag fields, incl. scalar expressions
        on top of aggregates (e.g. SUM(x.a)/COUNT(x), ROUND_TO(SUM(x.a),2))."""
        if self._contains_inner_plan(e):
            return False
        if isinstance(e, E.Func):
            if e.name.upper() in ALGEBRAIC_AGGS or \
                    e.name.upper() in self.udafs:
                return True
            # scalar fn over aggregates: ≥1 algebraic arg, rest literals
            args_ok = all(self._is_algebraic_agg(a) or isinstance(a, E.Lit)
                          for a in e.args)
            return args_ok and any(self._is_algebraic_agg(a) for a in e.args)
        if isinstance(e, E.BinOp):
            return (self._is_algebraic_agg(e.left) or isinstance(e.left, E.Lit)) and \
                   (self._is_algebraic_agg(e.right) or isinstance(e.right, E.Lit)) and \
                   (self._is_algebraic_agg(e.left) or self._is_algebraic_agg(e.right))
        if isinstance(e, E.Cast):
            return self._is_algebraic_agg(e.child)
        return False

    @staticmethod
    def _iter_funcs(e: E.Expr):
        """Every Func node in an expression tree (iterative walk over the
        dataclass fields, list/tuple children included)."""
        import dataclasses
        stack = [e]
        while stack:
            n = stack.pop()
            if isinstance(n, E.Func):
                yield n
            if dataclasses.is_dataclass(n):
                for f in dataclasses.fields(n):
                    v = getattr(n, f.name)
                    if isinstance(v, E.Expr):
                        stack.append(v)
                    elif isinstance(v, (list, tuple)):
                        stack.extend(x for x in v if isinstance(x, E.Expr))

    def _percentile_fusion_map(self, gens: list[E.Expr],
                               first_col: str | None) -> dict:
        """repr(child-expr) → sorted distinct percentage literals, for
        every PERCENTILE input column that appears with >= 2 distinct
        percentages across the FOREACH's generators (keyed on the
        post-bag-ref-rewrite form — the form the fused agg compiles).

        ExprCompiler then compiles each such PERCENTILE(c, p) as
        element_at(percentile(c, array(ps)), idx): the percentile
        aggregates are IDENTICAL expressions across generators, so
        Catalyst deduplicates them into ONE sort-buffer per column where
        the naive compile buffers every value of the column once per
        requested percentage (exact percentile is a holistic aggregate —
        its buffer is the whole column). Spark's Percentile evaluates
        the array form by interpolating each point from the same sorted
        counts map with the same arithmetic as the scalar form, so the
        produced doubles are identical."""
        groups: dict[str, set] = {}
        for g in gens:
            inner = g.child if isinstance(g, E.Aliased) else g
            try:
                inner = self._normalize_distinct_agg(inner, first_col)
                rw = self._rewrite_bag_refs(inner, first_col)
            except Exception:
                continue
            for node in self._iter_funcs(rw):
                if node.name.upper() == "PERCENTILE" \
                        and len(node.args) == 2 \
                        and isinstance(node.args[1], E.Lit) \
                        and isinstance(node.args[1].value, (int, float)) \
                        and not isinstance(node.args[1].value, bool):
                    groups.setdefault(repr(node.args[0]), set()) \
                          .add(float(node.args[1].value))
        return {k: sorted(v) for k, v in groups.items() if len(v) >= 2}

    def _rewrite_bag_refs(self, e: E.Expr,
                          first_col: str | None = None) -> E.Expr:
        """Inside a fused aggregate, `bag.field` / `rel.field` refs become
        direct column refs on the pre-group child. COUNT(bag) counts tuples
        whose FIRST field is non-null (pig:src/org/apache/pig/builtin/
        COUNT.java) → count(first_col); COUNT_STAR(bag) counts all."""
        if isinstance(e, E.Deref):
            if isinstance(e.field, str):
                return E.Col(e.field)
            return e
        if isinstance(e, E.Func):
            name = e.name.upper()
            if name in ("COUNT", "COUNT_STAR") and len(e.args) == 1 and \
                    isinstance(e.args[0], E.Col):
                if name == "COUNT" and first_col is not None:
                    return E.Func("COUNT", [E.Col(first_col)])
                return E.Func("COUNT_STAR", [])
            return E.Func(e.name,
                          [self._rewrite_bag_refs(a, first_col)
                           for a in e.args])
        if isinstance(e, E.BinOp):
            return E.BinOp(e.op, self._rewrite_bag_refs(e.left, first_col),
                           self._rewrite_bag_refs(e.right, first_col))
        if isinstance(e, E.Cast):
            return E.Cast(e.pig_type,
                          self._rewrite_bag_refs(e.child, first_col))
        return e

    def _c_group(self, node: L.Group) -> DataFrame:
        """Unfused GROUP: the bag escapes → materialize (group, bag).

        collect_list(struct(*)) is the reference's bag; this is the slow
        path by design (SURVEY.md §4.3) — the fusion above avoids it
        whenever the consumer is aggregate-only.
        """
        df = self._compile(node.child)
        ctx = self._ctx(df)
        bag_alias = getattr(node, "bag_alias", "bag")
        bag = F.collect_list(F.struct(*[F.col(c) for c in df.columns])) \
               .alias(bag_alias)
        if node.mode == "all":
            return df.groupBy().agg(bag).select(
                F.lit("all").alias(GROUP_COL), F.col(bag_alias))
        keys = self._expand_star_keys(df, node.keys)
        key_cols = self._group_key_cols(ctx, keys)
        df = self._probe_keys(df, keys)     # group-key cast discards
        key_names = [self._key_name(k, i) for i, k in enumerate(keys)]
        if node.mode == "cube":
            grouped = df.cube(*key_cols).agg(bag)
        elif node.mode == "rollup":
            grouped = df.rollup(*key_cols).agg(bag)
        elif node.mode == "gsets":
            # mixed CUBE/ROLLUP: the bag escapes through groupingSets
            # too — same raw-expression grouping + rename as the fused
            # path (groupingSets matches set members by expression
            # equality, so aliased copies would group as all-null)
            raw = [ctx.compile(k) for k in keys]
            sets = [[raw[i] for i in s] for s in node.gsets]
            grouped = df.groupingSets(sets, *raw).agg(bag)
            for old, new in zip(grouped.columns[:len(key_names)],
                                key_names):
                if old != new:
                    grouped = grouped.withColumnRenamed(old, new)
        else:
            grouped = df.groupBy(*key_cols).agg(bag)
        if len(key_names) == 1:
            group_col = F.col(key_names[0]).alias(GROUP_COL)
        else:
            group_col = F.struct(*[F.col(n) for n in key_names]).alias(GROUP_COL)
        out = grouped.select(group_col, F.col(bag_alias))
        placed = self._apply_partitioner(node, out, [GROUP_COL])
        if placed is not None:
            return placed
        if node.parallel:
            out = out.repartition(node.parallel, GROUP_COL)
        return out

    def _apply_partitioner(self, node, df: DataFrame,
                           key_cols: list[str]) -> DataFrame | None:
        """Honor PARTITION BY <class> when a placement function is
        registered under that name (Engine.register_partitioner) — the
        group OUTPUT is placed by fn(key) % n, Pig's observable effect
        (which part-file each group lands in under STORE). Unregistered
        names keep the accepted-and-ignored behavior (Catalyst placement),
        with a warning. Returns None when not applied."""
        name = getattr(node, "partitioner", None)
        if not name:
            return None
        fn = self.partitioners.get(name)
        if fn is None:
            import warnings
            warnings.warn(
                f"PARTITION BY {name}: no placement function registered "
                "under this name (Engine.register_partitioner); using "
                "Spark's hash placement")
            return None
        from ..operators.partitioner import custom_partition
        n = node.parallel or int(
            self.spark.conf.get("spark.sql.shuffle.partitions"))
        return custom_partition(df, key_cols, n, fn)

    @staticmethod
    def _key_name(k: E.Expr, i: int) -> str:
        if isinstance(k, E.Aliased):
            return k.name
        if isinstance(k, E.Col):
            return k.name
        return f"group_{i}"

    # COGROUP bags consumed ONLY through these aggregates (plus IsEmpty
    # filters) fuse to per-side groupBy().agg() — the conservative subset
    # whose empty-bag semantics are pinned below (COUNT/COUNT_STAR → 0,
    # the rest → null, matching Pig's empty-bag aggregates).
    _COGROUP_FUSABLE = {"COUNT", "COUNT_STAR", "SUM", "AVG", "MIN", "MAX"}

    def _cogroup_conj_terms(self, pred: E.Expr) -> list | None:
        """Flatten an AND tree into terms; None when any other operator
        appears (the filter then needs the materialized bags)."""
        if isinstance(pred, E.BinOp) and pred.op.lower() == "and":
            left = self._cogroup_conj_terms(pred.left)
            right = self._cogroup_conj_terms(pred.right)
            return None if left is None or right is None else left + right
        return [pred]

    @staticmethod
    def _cogroup_isempty_term(t: E.Expr, bag_names: list[str]):
        """(bag_name, must_be_empty) for IsEmpty(bag) / NOT IsEmpty(bag);
        None for anything else."""
        want_empty = True
        if isinstance(t, E.UnOp) and t.op == "not":
            want_empty, t = False, t.child
        if isinstance(t, E.Func) and t.name.upper() == "ISEMPTY" \
                and len(t.args) == 1 and isinstance(t.args[0], E.Col) \
                and t.args[0].name in bag_names:
            return t.args[0].name, want_empty
        return None

    @staticmethod
    def _cogroup_bag_refs(e: E.Expr, bag_names: list[str]) -> set | None:
        """Bag names referenced by an aggregate argument tree; None when
        the tree references anything that is NOT a bag (the only columns
        of a cogrouped relation are `group` and the bags, so a foreign
        Col means the expression needs the materialized frame)."""
        refs: set[str] = set()
        stack = [e]
        import dataclasses
        while stack:
            n = stack.pop()
            if isinstance(n, E.Col):
                if n.name in bag_names:
                    refs.add(n.name)
                    continue
                return None          # group (or unknown) inside an agg
            if dataclasses.is_dataclass(n):
                for f in dataclasses.fields(n):
                    v = getattr(n, f.name)
                    if isinstance(v, E.Expr):
                        stack.append(v)
                    elif isinstance(v, (list, tuple)):
                        stack.extend(x for x in v if isinstance(x, E.Expr))
        return refs

    def _try_fuse_cogroup_agg(self, node: L.ForEach) -> DataFrame | None:
        """FOREACH (FILTER* (COGROUP …)) whose bag uses are ALL algebraic
        aggregates — and whose filters are IsEmpty tests — compiles to
        per-side groupBy().agg() + the same null-safe full-outer key
        join, WITHOUT materializing the bags: the exchanges then carry
        one partial-aggregate row per key instead of collect_list'ing
        every input column of every row (the COGROUP+IsEmpty anti-join
        idiom shuffled 11-column structs to count them). Empty-bag
        semantics are preserved exactly: an absent side leaves its
        aggregate columns null after the outer join — which IS Pig's
        SUM/AVG/MIN/MAX over an empty bag — and COUNT/COUNT_STAR
        coalesce to 0; IsEmpty(bag) ⇔ the side's group-presence count
        is null. Gated by spark.spork.optimizer.fuseCogroupAgg (default
        on); disabled under the warnings surface (the fallback bag path
        carries the cast probes)."""
        if self._conf("spark.spork.optimizer.fuseCogroupAgg",
                      "true") != "true" or self._warnings_on():
            return None
        terms: list[E.Expr] = []
        cur = node.child
        while isinstance(cur, L.Filter) and \
                self._consumers.get(cur._id, 0) <= 1:
            ts = self._cogroup_conj_terms(cur.predicate)
            if ts is None:
                return None
            terms.extend(ts)
            cur = cur.child
        if not isinstance(cur, L.CoGroup) or \
                self._consumers.get(cur._id, 0) > 1:
            return None
        if getattr(cur, "partitioner", None):
            # PARTITION BY <class> is an observable placement contract
            # (which part-file each group lands in under STORE) that
            # _c_cogroup honors via _apply_partitioner — the fused
            # shape would silently drop it, so fall back to the bag
            # path (r10 advisor).
            return None
        if any(len(ks) != 1 for ks in cur.keys):
            return None               # single-key cogroups only (v1)
        bag_names = [getattr(inp, "alias", None) or f"bag_{i}"
                     for i, inp in enumerate(cur.inputs)]
        if len(set(bag_names)) != len(bag_names) or GROUP_COL in bag_names:
            return None
        parsed_terms = []
        for t in terms:
            p = self._cogroup_isempty_term(t, bag_names)
            if p is None:
                return None
            parsed_terms.append(p)
        # classify generators: group refs, or one-bag algebraic aggs
        plan_gens = []   # ("group", name) | ("agg", side_idx, expr, name, fn)
        for i, g in enumerate(node.generators):
            alias, inner = (g.name, g.child) if isinstance(g, E.Aliased) \
                else (None, g)
            if isinstance(inner, E.Col) and inner.name == GROUP_COL:
                plan_gens.append(("group", alias or GROUP_COL))
                continue
            if isinstance(inner, E.Deref) and \
                    isinstance(inner.child, E.Col) and \
                    inner.child.name == GROUP_COL:
                # group.field on a struct-typed key: the fused path
                # compiled this as the WHOLE key (and misnamed it
                # 'group') — fall back to the bag path, which projects
                # the dereferenced field correctly (r10 advisor).
                return None
            if not isinstance(inner, E.Func) or \
                    inner.name.upper() not in self._COGROUP_FUSABLE:
                return None
            refs = self._cogroup_bag_refs(inner, bag_names)
            if not refs or len(refs) != 1:
                return None
            plan_gens.append(("agg", bag_names.index(next(iter(refs))),
                              inner, alias or f"col_{i}",
                              inner.name.upper()))
        if not any(pg[0] == "agg" for pg in plan_gens):
            return None
        # per-side partial aggregation (replaces per-side collect_list)
        side_frames = []
        for idx, (inp, keys) in enumerate(zip(cur.inputs, cur.keys)):
            df = self._compile(inp)
            ctx = self._ctx(df)
            first = df.columns[0] if df.columns else None
            kname = "__k" if idx == 0 else f"__r{idx}"
            key_col = ctx.compile(keys[0]).alias(kname)
            aggs = [F.count(F.lit(1)).alias(f"__n{idx}")]
            for gi, pg in enumerate(plan_gens):
                if pg[0] == "agg" and pg[1] == idx:
                    rw = self._rewrite_bag_refs(pg[2], first)
                    aggs.append(ctx.compile(rw).alias(f"__a{gi}"))
            side_frames.append(df.groupBy(key_col).agg(*aggs))
        out = side_frames[0]
        for idx, g in enumerate(side_frames[1:], 1):
            rname = f"__r{idx}"
            out = out.join(g, on=F.col("__k").eqNullSafe(F.col(rname)),
                           how="full")
            out = out.withColumn("__k", F.coalesce(F.col("__k"),
                                                   F.col(rname))) \
                     .drop(rname)
        inner_flags = cur.inner or [False] * len(cur.inputs)
        for idx, is_inner in enumerate(inner_flags):
            if is_inner:
                out = out.filter(F.col(f"__n{idx}").isNotNull())
        for bag, want_empty in parsed_terms:
            n = F.col(f"__n{bag_names.index(bag)}")
            out = out.filter(n.isNull() if want_empty else n.isNotNull())
        if getattr(cur, "parallel", None):
            # PARALLEL on the COGROUP sets the reduce-side partition
            # count (observable as part-file count under STORE);
            # _c_cogroup honors it with a group-keyed repartition, so
            # the fused shape must too (r10 advisor).
            out = out.repartition(cur.parallel, F.col("__k"))
        final = []
        for gi, pg in enumerate(plan_gens):
            if pg[0] == "group":
                final.append(F.col("__k").alias(pg[1]))
            else:
                c = F.col(f"__a{gi}")
                if pg[4] in ("COUNT", "COUNT_STAR"):
                    c = F.coalesce(c, F.lit(0).cast("bigint"))
                final.append(c.alias(pg[3]))
        return out.select(*final)

    def _c_cogroup(self, node: L.CoGroup) -> DataFrame:
        """COGROUP a BY k, b BY k → (group, bag_a, bag_b): per-input
        groupBy+collect_list, then FULL OUTER join on key; absent groups get
        EMPTY (not null) bags; per-input INNER filters empties
        (SURVEY.md §2.1 #8)."""
        inner = node.inner or [False] * len(node.inputs)
        sides = []
        for idx, (inp, keys) in enumerate(zip(node.inputs, node.keys)):
            df = self._compile(inp)
            ctx = self._ctx(df)
            bag_name = getattr(inp, "alias", None) or f"bag_{idx}"
            key_cols = [ctx.compile(k).alias(f"__k{i}")
                        for i, k in enumerate(keys)]
            bag_type = T.ArrayType(df.schema)
            df = self._probe_keys(df, keys)  # cogroup-key cast discards
            g = df.groupBy(*key_cols).agg(
                F.collect_list(F.struct(*[F.col(c) for c in df.columns]))
                 .alias(bag_name))
            sides.append((g, bag_name, bag_type))
        out, _, _ = sides[0]
        knames = [f"__k{i}" for i in range(len(node.keys[0]))]
        for idx, (g, _, _) in enumerate(sides[1:], 1):
            # Null-SAFE key join: GROUP/COGROUP collect null keys into one
            # group (Pig "Nulls" contract — unlike JOIN, where null keys
            # never match). A USING join would split the null group per
            # side, so join on <=> and coalesce the key columns.
            rk = [f"__r{idx}_{i}" for i in range(len(knames))]
            for old, new in zip(knames, rk):
                g = g.withColumnRenamed(old, new)
            cond = None
            for lname, rname in zip(knames, rk):
                c = F.col(lname).eqNullSafe(F.col(rname))
                cond = c if cond is None else cond & c
            out = out.join(g, on=cond, how="full")
            for lname, rname in zip(knames, rk):
                out = out.withColumn(lname,
                                     F.coalesce(F.col(lname), F.col(rname))) \
                         .drop(rname)
        bag_cols = [F.coalesce(F.col(bag_name),
                               F.array().cast(bag_type)).alias(bag_name)
                    for _, bag_name, bag_type in sides]
        if len(knames) == 1:
            group_col = F.col(knames[0]).alias(GROUP_COL)
        else:
            group_col = F.struct(*[F.col(n) for n in knames]).alias(GROUP_COL)
        out = out.select(group_col, *bag_cols)
        for (_, bag_name, _), is_inner in zip(sides, inner):
            if is_inner:
                out = out.filter(F.size(F.col(bag_name)) > 0)
        placed = self._apply_partitioner(node, out, [GROUP_COL])
        if placed is not None:
            return placed
        if getattr(node, "parallel", None):
            out = out.repartition(node.parallel, GROUP_COL)
        return out

    def _c_groupapply(self, node: L.GroupApply) -> DataFrame:
        df = self._compile(node.child)
        ctx = self._ctx(df)
        keys = [ctx.compile(k) for k in node.keys]
        return df.groupBy(*keys).applyInPandas(node.func, node.out_schema)

    # ----------------------------------------------------------------- joins
    def _c_join(self, node: L.Join) -> DataFrame:
        """Equi-join; null keys never match (Spark = Pig). Strategy variants
        are hints over identical semantics (SURVEY.md §2.1 #9–14)."""
        dfs = [self._compile(i) for i in node.inputs]
        post_explodes: list[tuple[str, Any]] = []
        if node.how == "inner":
            # Pig's PushDownForEachFlatten (SURVEY.md §4.1): Catalyst has no
            # rule to reorder Generate below Join, so a FLATTEN-then-JOIN
            # script would shuffle the exploded (amplified) rows. When the
            # join keys don't touch the flattened output, defer the explode
            # to after the join: the bag crosses the exchange as one column
            # on the un-amplified row count.
            for idx in range(len(node.inputs)):
                d = self._try_defer_flatten(node, idx, dfs)
                if d is not None:
                    dfs[idx], explodes = d
                    post_explodes.extend(explodes)
        dfs = self._disambiguate(dfs, node)
        left = dfs[0]
        lkeys = [self._ctx(left).compile(k) for k in node.keys[0]]
        # key-cast discard probes ride each join INPUT (POCast warns at
        # the local-rearrange cast). raw_left stays un-observed: the
        # merge-sparse semi-prune re-reads the left subtree, and a
        # shared observe node there would fold its accumulator twice.
        raw_left = left
        left = self._probe_keys(left, node.keys[0])
        for i in range(1, len(dfs)):
            right = self._probe_keys(dfs[i], node.keys[i])
            if node.strategy == "replicated":
                # USING 'replicated' → POFRJoin → broadcast hash join
                right = F.broadcast(right)
            elif node.strategy == "merge":
                right = right.hint("merge")
            elif node.strategy == "merge_sparse":
                # USING 'merge-sparse' (pig:…/POMergeCogroup.java sparse
                # path): Pig seeks the sorted right side via its sparse
                # index, touching only blocks whose keys occur on the
                # (few-keyed) left. Spark-first equivalent: broadcast-
                # semi-prune the right input on the left's distinct keys
                # — the sparse premise is exactly "left keys are few", so
                # the distinct-key set broadcasts — then sort-merge the
                # pruned remainder. The prune happens below the SMJ's
                # exchange+sort, so non-matching right rows never shuffle
                # or sort. Inner-join only (Pig's own restriction); other
                # hows fall back to the plain merge hint.
                if node.how == "inner":
                    # built from the un-observed left (see raw_left
                    # above); for n-way tails the running join result
                    # is the only available source — Pig's merge join
                    # is 2-way, so that branch is theoretical.
                    probe_src = raw_left if i == 1 else left
                    probe = probe_src.select(
                        *[k.alias(f"__msk{j}")
                          for j, k in enumerate(lkeys)]).distinct()
                    rk = [self._ctx(dfs[i]).compile(k)
                          for k in node.keys[i]]
                    pcond = None
                    for j, r in enumerate(rk):
                        c = r == F.col(f"__msk{j}")
                        pcond = c if pcond is None else pcond & c
                    right = right.join(F.broadcast(probe), on=pcond,
                                       how="left_semi")
                right = right.hint("merge")
            elif node.strategy == "default":
                # Pig's default JOIN is a shuffled HASH join (JoinPackager
                # over the rearrange pipeline, SURVEY.md §2.1 #9). Spark's
                # default is SMJ; `spark.spork.join.defaultStrategy` lets a
                # deployment restore the hash-join physical choice
                # (shuffle_hash avoids the two per-side sorts — measurably
                # faster when shuffled partitions fit in memory, which AQE
                # guards at scale). Default 'auto' defers to Catalyst/AQE.
                hint = self._conf("spark.spork.join.defaultStrategy", "auto")
                if hint == "shuffle_hash" and \
                        self._side_broadcastable(left, right):
                    # A strategy hint OVERRIDES Catalyst's size-based
                    # broadcast selection — hinting shuffle_hash when a
                    # side fits under autoBroadcastJoinThreshold would
                    # force an exchange on BOTH sides where a broadcast
                    # join needs none. Leave the join unhinted so the
                    # small side broadcasts (and if it somehow doesn't,
                    # preferSortMergeJoin=false still yields SHJ).
                    pass
                elif hint in ("shuffle_hash", "merge", "broadcast"):
                    # Hint the LEFT side: Pig's packager materializes the
                    # earlier inputs and STREAMS the last one, so the left
                    # is the hash-build side (and in left-deep n-way joins
                    # it's also the smaller, already-reduced side).
                    left = left.hint(hint)
            rkeys = [self._ctx(dfs[i]).compile(k) for k in node.keys[i]]
            cond = None
            for lk, rk in zip(lkeys, rkeys):
                c = lk == rk
                cond = c if cond is None else (cond & c)
            how = {"semi": "left_semi", "anti": "left_anti"}.get(node.how,
                                                                 node.how)
            left = left.join(right, on=cond, how=how)
        for tmp, alias in post_explodes:
            left = self._explode_one(left, tmp, alias)
        if node.parallel:
            left = left.repartition(node.parallel)
        return left

    def _try_defer_flatten(self, node: L.Join, idx: int,
                           dfs: list[DataFrame]):
        """If input ``idx`` is a FOREACH containing FLATTEN(bag) generators
        and this input's join keys reference only the non-flattened outputs,
        return (replacement DataFrame keeping the bag column, explodes to
        apply after the join); else None.

        Legal for INNER joins only: explode(bag)⋈k ≡ (⋈k)∘explode when k is
        independent of the bag (empty/null bags drop the row on either side
        of the join identically). Outer joins differ on the null-extended
        side (a null-filled bag would drop the preserved row), so they keep
        the eager explode. Reference rule:
        pig:src/org/apache/pig/newplan/logical/rules/PushDownForEachFlatten.java.
        """
        inp = node.inputs[idx]
        if not isinstance(inp, L.ForEach) or \
                self._consumers.get(inp._id, 0) > 1:
            return None
        flats: dict[int, tuple] = {}
        non_flat: set[str] = set()
        for i, g in enumerate(inp.generators):
            alias, inner = None, g
            if isinstance(inner, E.Aliased):
                alias, inner = inner.name, inner.child
            if isinstance(inner, E.Flatten):
                flats[i] = (alias, inner.child)
            elif isinstance(inner, (E.Star, E.RangeProj)):
                return None                    # names need schema; keep eager
            else:
                non_flat.add(alias if isinstance(alias, str)
                             else self._default_name(inner, i))
        if not flats:
            return None
        for k in node.keys[idx]:
            if not set(self._expr_col_refs(k)) <= non_flat:
                return None                    # key depends on the flatten
        child_df = self._compile(inp.child)
        ctx = self._ctx(child_df)
        other_cols = {c for j, df in enumerate(dfs) if j != idx
                      for c in df.columns}
        new_gens = list(inp.generators)
        explodes: list[tuple[str, Any]] = []
        for i, (alias, inner) in flats.items():
            try:
                dt = child_df.select(
                    ctx.compile(inner).alias("x")).schema[0].dataType
            except Exception:
                return None
            if not isinstance(dt, T.ArrayType):
                return None        # tuple/map flatten: no row fan-out to defer
            if isinstance(alias, tuple) and \
                    not isinstance(dt.elementType, T.StructType):
                return None        # STRSPLIT-style inline: no fan-out either
            # final flattened names must match the eager path bare (a
            # collision would have been alias::qualified there — bail)
            if isinstance(dt.elementType, T.StructType):
                fields = dt.elementType.fields
                if isinstance(alias, tuple):
                    names = list(alias)
                elif isinstance(alias, str) and len(fields) == 1:
                    names = [alias]
                else:
                    names = [f.name for f in fields]
            elif isinstance(alias, str):
                names = [alias]
            else:
                return None        # bare scalar-array flatten naming edge
            if other_cols & set(names):
                return None
            tmp = f"__jbf_{inp._id}_{i}"
            new_gens[i] = E.Aliased(inner, tmp)
            explodes.append((tmp, alias))
        return self._apply_generators(child_df, new_gens), explodes

    @staticmethod
    def _expr_col_refs(e: E.Expr) -> list[str]:
        """All column names referenced anywhere in an expression tree."""
        out: list[str] = []

        def walk(x):
            if isinstance(x, E.Col):
                out.append(x.name)
            if isinstance(x, E.Expr):
                for f in dataclasses.fields(x):
                    walk(getattr(x, f.name))
            elif isinstance(x, (list, tuple)):
                for v in x:
                    walk(v)
        walk(e)
        return out

    def _disambiguate(self, dfs: list[DataFrame], node) -> list[DataFrame]:
        """Pig join output schema qualifies colliding names as alias::col;
        non-colliding names stay bare (Pig's resolution rule)."""
        from collections import Counter
        counts = Counter(c for df in dfs for c in df.columns)
        out = []
        for idx, df in enumerate(dfs):
            alias = getattr(node.inputs[idx], "alias", None) or f"in{idx}"
            renames = {c: f"{alias}::{c}" for c in df.columns if counts[c] > 1}
            if renames:
                df = df.withColumnsRenamed(renames)
                # key exprs referencing the bare name must follow the rename
                node.keys[idx] = [self._qualify(k, renames)
                                  for k in node.keys[idx]]
            out.append(df)
        return out

    @staticmethod
    def _qualify(e: E.Expr, renames: dict[str, str]) -> E.Expr:
        if isinstance(e, E.Col) and e.name in renames:
            return E.Col(renames[e.name])
        if isinstance(e, E.BinOp):
            return E.BinOp(e.op, PlanCompiler._qualify(e.left, renames),
                           PlanCompiler._qualify(e.right, renames))
        if isinstance(e, E.Func):
            return E.Func(e.name, [PlanCompiler._qualify(a, renames)
                                   for a in e.args])
        if isinstance(e, E.Cast):
            return E.Cast(e.pig_type, PlanCompiler._qualify(e.child, renames))
        return e

    def _c_cross(self, node: L.Cross) -> DataFrame:
        dfs = self._compile(node.inputs[0]), *[self._compile(i)
                                               for i in node.inputs[1:]]
        dfs = self._disambiguate(list(dfs), _CrossShim(node.inputs))
        out = dfs[0]
        for df in dfs[1:]:
            out = out.crossJoin(df)
        return out

    # ---------------------------------------------------------------- order
    def _c_sort(self, node: L.Sort) -> DataFrame:
        """ORDER BY: Spark SortExec = sampled range partitioning (the
        reference's WeightedRangePartitioner, built in). Pig null ordering:
        nulls smallest."""
        df = self._compile(node.child)
        ctx = self._ctx(df)
        pairs = [(k2, asc) for k, asc in node.keys
                 for k2 in self._expand_star_keys(df, [k])]
        keys = [ctx.compile(k).asc_nulls_first() if asc
                else ctx.compile(k).desc_nulls_last()
                for k, asc in pairs]
        df = self._probe_keys(df, pairs)    # sort-key cast discards
        if node.parallel:
            # Pig ORDER ... PARALLEL n = n reducers for the range sort;
            # the output stays TOTALLY ordered across partitions. A
            # round-robin repartition after orderBy would destroy that
            # (caught by the PigMix L9 golden): range-partition on the
            # sort keys, then sort within — partition ids carry the
            # global order.
            return (df.repartitionByRange(node.parallel, *keys)
                      .sortWithinPartitions(*keys))
        return df.orderBy(*keys)

    def _c_rank(self, node: L.Rank) -> DataFrame:
        df = self._compile(node.child)
        if not node.keys:
            return self._scalable_row_number(df, node.name)
        return self._scalable_rank_by(df, node)

    def _scalable_rank_by(self, df: DataFrame, node: L.Rank) -> DataFrame:
        """RANK rel BY keys [DENSE] without a global single-partition
        window (SURVEY.md §7 hard-part 3):

          rank(t)       = 1 + Σ count(k) over keys k < t.keys
          dense_rank(t) = 1 + #distinct keys < t.keys

        1. aggregate to the distinct-key table with counts (shuffle 1,
           partial agg — |keys| rows, not |rows|);
        2. range-sort the key table and prefix-sum the counts with the
           same two-pass per-partition-offset trick as bare RANK (the
           offsets collect is one row per partition);
        3. join ranks back on the keys (shuffle 2) — null-safe equality,
           because Pig ranks null keys (they sort smallest).

        Ties share a key row, hence exactly rank()/dense_rank() ties.
        """
        ctx = self._ctx(df)
        key_names = [f"__rk{i}" for i in range(len(node.keys))]
        key_cols = [ctx.compile(k).alias(n)
                    for (k, _), n in zip(node.keys, key_names)]
        df = self._probe_keys(df, node.keys)  # rank-key cast discards
        kdf = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__cnt"))
        order = [F.col(n).asc_nulls_first() if asc
                 else F.col(n).desc_nulls_last()
                 for (_, asc), n in zip(node.keys, key_names)]
        kdf = kdf.orderBy(*order)

        pid = "__pid"
        # eager localCheckpoint, not persist: the offsets collected below
        # must match the partition ids the later join sees, and a
        # recomputed range exchange can re-sample different bounds
        # (RangePartitioner seeds from the RDD id) — checkpointing freezes
        # the assignment; the RDD-level blocks free via GC with the
        # result's lineage instead of pinning a CacheManager entry
        staged = kdf.withColumn(pid, F.spark_partition_id()) \
                    .localCheckpoint(eager=True)
        # shared two-pass offsets core (operators/_scalable.py): rank
        # needs the exclusive ROW total, dense the exclusive KEY total
        from ..operators._scalable import partition_offsets
        offdf, n_parts = partition_offsets(
            staged, {"__rowoff": F.sum("__cnt"),
                     "__keyoff": F.count(F.lit(1))}, pid=pid)
        staged_off = staged.join(F.broadcast(offdf), on=pid, how="left")
        w = Window.partitionBy(pid).orderBy(*order) \
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        running = F.sum("__cnt").over(w)
        wrow = Window.partitionBy(pid).orderBy(*order)
        ranked_keys = staged_off.select(
            *key_names,
            (F.coalesce(F.col("__rowoff"), F.lit(0))
             + running - F.col("__cnt") + 1)
            .cast("long").alias("__rank"),
            (F.coalesce(F.col("__keyoff"), F.lit(0))
             + F.row_number().over(wrow))
            .cast("long").alias("__dense"))

        out_rank = F.col("__dense") if node.dense else F.col("__rank")
        orig_keys = [ctx.compile(k) for k, _ in node.keys]
        cond = None
        for oc, n in zip(orig_keys, key_names):
            c = oc.eqNullSafe(ranked_keys[n])
            cond = c if cond is None else cond & c
        joined = df.join(F.broadcast(ranked_keys) if n_parts <= 1
                         else ranked_keys, on=cond)
        return joined.select(out_rank.alias(node.name), *df.columns)

    def _scalable_row_number(self, df: DataFrame, out_name: str) -> DataFrame:
        """Reference design (POCounter/PORank, SURVEY.md §2.1 #18): pass 1
        counts rows per partition (tiny driver collect — one row per
        partition); pass 2 adds prefix-sum offset to a per-partition
        row_number. No global shuffle, no 1-partition window."""
        pid, mid = "__pid", "__mid"
        staged = df.withColumn(pid, F.spark_partition_id()) \
                   .withColumn(mid, F.monotonically_increasing_id())
        # eager localCheckpoint for the same reason as _c_rank: pid/mid
        # captured here must be identical in the count pass and the join
        # pass, and recompute does not guarantee that; GC-freed, no
        # CacheManager pin
        staged = staged.localCheckpoint(eager=True)
        from ..operators._scalable import partition_offsets
        offdf, _ = partition_offsets(
            staged, {"__off": F.count(F.lit(1))}, pid=pid)
        staged_off = staged.join(F.broadcast(offdf), on=pid, how="left")
        w = Window.partitionBy(pid).orderBy(mid)
        out = staged_off.withColumn(
            out_name, (F.row_number().over(w)
                       + F.coalesce(F.col("__off"), F.lit(0))).cast("long"))
        return out.select(out_name, *df.columns)

    # ---------------------------------------------------------------- set ops
    def _c_union(self, node: L.Union) -> DataFrame:
        """UNION: bag union, NO dedup. ONSCHEMA merges by name with null
        padding; positional union requires equal arity (Pig nulls the
        schema on mismatch — we synthesize the widened schema instead,
        SURVEY.md §7 hard-part 5)."""
        dfs = [self._compile(i) for i in node.inputs]
        out = dfs[0]
        for df in dfs[1:]:
            if node.onschema or set(out.columns) != set(df.columns):
                out = out.unionByName(df, allowMissingColumns=True)
            else:
                out = out.unionByName(df)
        return out

    # -------------------------------------------------------------- streaming
    def _c_streamthrough(self, node: L.StreamThrough) -> DataFrame:
        """STREAM rel THROUGH 'cmd' — PigStreaming-compatible tab-delimited
        pipe through an external executable (POStream/ExecutableManager,
        SURVEY.md §2.9). RDD pipe is the one legitimate RDD use."""
        df = self._compile(node.child)
        ncols = len(df.columns)
        tsv = df.select(F.concat_ws(
            "\t", *[F.coalesce(F.col(c).cast("string"), F.lit(""))
                    for c in df.columns]))
        lines = tsv.rdd.map(lambda r: r[0])
        if node.shipped:
            # SHIP'd commands need the task-local SparkFiles dir as cwd —
            # resolvable only on the executor, so rdd.pipe (driver-fixed
            # argv) can't express it: subprocess-per-partition with a
            # stdin feeder thread (the ExecutableManager model).
            piped = lines.mapPartitions(_pipe_with_cwd(node.command))
        else:
            piped = lines.pipe(node.command)
        schema = node.schema
        if schema is None:
            schema = T.StructType([T.StructField(f"f{i}", T.StringType())
                                   for i in range(ncols)])
        elif isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        split = piped.map(lambda line: line.split("\t"))
        str_schema = T.StructType([T.StructField(f.name, T.StringType())
                                   for f in schema.fields])
        out = self.spark.createDataFrame(split, str_schema)
        casts = [F.col(f.name).cast(f.dataType).alias(f.name)
                 for f in schema.fields]
        return out.select(*casts)

    # ----------------------------------------------------------------- sinks
    def _c_store(self, node: L.Store) -> DataFrame:
        from ..sources import write
        df = self._compile(node.child)
        write(df, node.path, node.fmt, node.options, node.partition_by)
        return df


def _pipe_with_cwd(command: str):
    """Partition pipe for SHIP'd STREAM commands: run the shell command
    with cwd = the task's SparkFiles root (where addFile'd scripts land on
    every executor), feeding stdin from a thread and yielding stdout
    lines. Mirrors pig:…/impl/streaming/ExecutableManager.java."""
    def run(it):
        import subprocess
        import threading

        from pyspark import SparkFiles
        proc = subprocess.Popen(
            command, shell=True, stdin=subprocess.PIPE,
            stdout=subprocess.PIPE, cwd=SparkFiles.getRootDirectory(),
            text=True)

        def feed():
            try:
                for line in it:
                    proc.stdin.write(line + "\n")
            finally:
                try:
                    proc.stdin.close()
                except Exception:
                    pass

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        for out in proc.stdout:
            yield out.rstrip("\n")
        proc.stdout.close()
        t.join()
        rc = proc.wait()
        if rc != 0:
            raise RuntimeError(
                f"STREAM command exited with status {rc}: {command!r}")
    return run


class _CrossShim:
    """Adapter so _disambiguate can treat CROSS like a keyless join."""
    def __init__(self, inputs):
        self.inputs = inputs
        self.keys = [[] for _ in inputs]
