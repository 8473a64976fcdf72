"""Distributed connected components — the cluster-assignment stage a
near-duplicate pipeline needs between "similar pairs" and "one survivor
per duplicate cluster" (extension beyond the reference surface;
BASELINE.json north star).

Algorithm: iterative min-label propagation with pointer jumping
(Shiloach–Vishkin style, the same family as the large-star/small-star
MapReduce formulation in Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14):

  1. propagate: label(v) ← min(label(v), min over neighbors label(u))
  2. jump:      label(v) ← label(label(v))   (path doubling)

The jump step halves the distance to the component minimum each round, so
convergence is O(log diameter) iterations — a 500-node chain converges in
~9 rounds where plain label propagation needs 500. Each iteration is two
key-shuffles (join + min-aggregate, then a self-join); labels are
localCheckpoint()ed per round to truncate the lineage, which otherwise
grows exponentially and overwhelms the Catalyst optimizer at scale.

Convergence is detected with a label-hash sum: labels only ever decrease
(by F.least, which orders strings as well as numbers), so an unchanged
sum of xxhash64(label) means a fixpoint — one cheap aggregate instead of
an expensive old-vs-new anti-join, and it works for non-numeric node ids
where a plain sum(label) would be NULL every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 30,
                         stats: dict | None = None) -> DataFrame:
    """(src, dst) undirected edges → (node, component), component = the
    smallest node id reachable from the node. Isolated endpoints appear
    with themselves; nodes absent from `edges` are absent from the output
    (union the full node set afterwards if needed).

    ``stats``: pass a dict to receive {"iterations": n, "converged":
    bool} — the scale-evidence numbers (convergence needs ~log2 of the
    graph diameter rounds) without re-instrumenting the loop."""
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
                .union(edges.select(F.col(dst).alias("a"),
                                    F.col(src).alias("b")))
                .filter(F.col("a") != F.col("b"))
                .distinct())
    sym = sym.localCheckpoint(eager=True)
    labels = (sym.select(F.col("a").alias("node"))
                 .distinct()
                 .withColumn("comp", F.col("node")))
    labels = labels.localCheckpoint(eager=True)
    prev_sum: object = object()          # sentinel: never equals a sum
    n_rounds = 0
    converged = False
    for _ in range(max_iter):
        n_rounds += 1
        # 1. min neighbor label
        nbr_min = (sym.join(labels.withColumnRenamed("node", "b"), on="b")
                      .groupBy(F.col("a").alias("node"))
                      .agg(F.min("comp").alias("nmin")))
        stepped = (labels.join(nbr_min, on="node", how="left")
                         .select("node",
                                 F.least("comp", F.coalesce("nmin", "comp"))
                                  .alias("comp")))
        # 2. pointer jump: comp ← comp(comp)
        parent = stepped.select(F.col("node").alias("comp"),
                                F.col("comp").alias("gcomp"))
        jumped = (stepped.join(parent, on="comp", how="left")
                         .select("node",
                                 F.least("comp", F.coalesce("gcomp", "comp"))
                                  .alias("comp")))
        jumped = jumped.localCheckpoint(eager=True)
        # decimal(38,0) sum cannot overflow (n*2^63 << 10^38), so the
        # detector is safe under ANSI mode too (external sessions)
        s = jumped.agg(F.sum(F.xxhash64(F.col("comp").cast("string"))
                             .cast("decimal(38,0)"))).collect()[0][0]
        old = labels
        labels = jumped
        old.unpersist()
        if s == prev_sum:        # labels are non-increasing ⇒ fixpoint
            converged = True
            break
        prev_sum = s
    else:
        import warnings
        warnings.warn(
            f"connected_components did not converge in {max_iter} "
            f"iterations; labels are an upper bound (some components may "
            f"still be split). Raise max_iter — convergence needs "
            f"~log2(graph diameter) rounds.", RuntimeWarning, stacklevel=2)
    if stats is not None:
        stats["iterations"] = n_rounds
        stats["converged"] = converged
    return labels


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             n_iter: int = 3, damping_pct: int = 85,
             units: int = 10 ** 12) -> DataFrame:
    """Fixed-iteration PageRank in EXACT integer arithmetic: ranks are
    integer mass units (``units`` total per initial node) and every
    update is integer division/multiplication, so the result is
    bit-identical on any cluster size, any fold order, and in an
    unrolled SQL oracle — the link-graph quality signal (crawl
    frontier, domain authority) computed the deterministic way.

    Update (all integer; ``div`` truncates, every term >= 0):
        r0     = units div N
        c[u]   = r[u] div out[u]                    (out[u] > 0)
        dang   = sum(r[u] : out[u] = 0)
        r'[v]  = ((100-d)*(units div N) + d*(inc[v] + dang div N)) div 100

    Shape per round: one equi-join of ranks with the edge list (key
    shuffle on src), one groupBy dst (key shuffle), one 1-row dangling
    aggregate broadcast into the update — the CC/k-means bounded-scalar
    pattern. Ranks persist per round and the previous round unpersists
    after materialization (lineage stays flat; no cached-block leak).
    Output: (node, rank_units bigint, rank double = units-normalized).
    """
    und = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))                .where(F.col(src).isNotNull() & F.col(dst).isNotNull())                .dropDuplicates(["u", "v"])
    nodes = (und.select(F.col("u").alias("node"))
                .unionAll(und.select(F.col("v").alias("node")))
                .dropDuplicates(["node"]))
    outdeg = und.groupBy(F.col("u").alias("node"))                 .agg(F.count(F.lit(1)).alias("__out"))
    base = nodes.join(outdeg, on="node", how="left")                 .select("node", F.coalesce(F.col("__out"), F.lit(0))
                        .alias("__out"))
    n_nodes = base.count()
    if n_nodes == 0:
        return edges.sparkSession.createDataFrame(
            [], "node long, rank_units long, rank double")
    share = units // n_nodes
    d, d_inv = damping_pct, 100 - damping_pct
    ranks = base.withColumn("__r", F.lit(share).cast("long")).persist()
    ranks.count()
    prev = ranks
    for _ in range(max(n_iter, 1)):
        dang = (ranks.where(F.col("__out") == 0)
                     .groupBy().agg(F.coalesce(F.sum("__r"), F.lit(0))
                                    .alias("__dang")))
        contrib = (ranks.where(F.col("__out") > 0)
                        .join(und, ranks["node"] == und["u"])
                        .select(F.col("v").alias("node"),
                                F.expr("__r div __out").alias("__c")))
        inc = contrib.groupBy("node").agg(F.sum("__c").alias("__inc"))
        upd = (f"cast((cast({d_inv * share} as bigint) + {d} * "
               f"(coalesce(__inc, cast(0 as bigint)) + "
               f"__dang div {n_nodes})) div 100 as bigint) as __r")
        ranks = (base.join(inc, on="node", how="left")
                     .crossJoin(F.broadcast(dang))
                     .selectExpr("node", "__out", upd)
                     .persist())
        ranks.count()
        prev.unpersist()
        prev = ranks
    out = ranks.select("node", F.col("__r").alias("rank_units"),
                       (F.col("__r") / F.lit(float(units)))
                       .alias("rank")).localCheckpoint(eager=True)
    ranks.unpersist()
    return out


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Global triangle count via degree-ordered edge orientation (the
    MapReduce-classic formulation of Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW'11):

    1. canonicalize to undirected distinct edges (self-loops dropped);
    2. orient every edge from its lower-(degree, id) endpoint to the
       higher — each triangle now has exactly ONE node with two
       outgoing oriented edges, so it is counted exactly once;
    3. wedges: self-join oriented adjacency on the source, keeping
       ordered pairs (v < w under the same total order);
    4. close: equi-join wedges against the oriented edge set.

    The orientation is the scale lever: a hub of degree d in the raw
    graph would generate d² wedges, but orientation bounds every
    node's out-degree by O(sqrt(m)) — the curse-of-the-last-reducer
    fix. All stages are equi-join/groupBy shuffles on keys.

    Output: one row, n_triangles (bigint).
    """
    und = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                        F.greatest(F.col(src), F.col(dst)).alias("b"))
                .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                       & (F.col("a") != F.col("b")))
                .dropDuplicates(["a", "b"]))
    deg = (und.select(F.col("a").alias("n"))
              .unionAll(und.select(F.col("b").alias("n")))
              .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
    withdeg = (und.join(deg.withColumnRenamed("n", "a")
                           .withColumnRenamed("d", "da"), on="a")
                  .join(deg.withColumnRenamed("n", "b")
                           .withColumnRenamed("d", "db"), on="b"))
    # orient low-(deg, id) → high-(deg, id); carry the dst's order key
    low_first = F.struct(F.col("da"), F.col("a")) \
        < F.struct(F.col("db"), F.col("b"))
    oriented = withdeg.select(
        F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(low_first, F.col("db")).otherwise(F.col("da")).alias("dv"))
    e1 = oriented.select("u", F.col("v").alias("v1"),
                         F.col("dv").alias("d1"))
    e2 = oriented.select("u", F.col("v").alias("v2"),
                         F.col("dv").alias("d2"))
    wedges = (e1.join(e2, on="u")
                .where(F.struct(F.col("d1"), F.col("v1"))
                       < F.struct(F.col("d2"), F.col("v2")))
                .select(F.col("v1").alias("u"), F.col("v2").alias("v")))
    closed = wedges.join(oriented.select("u", "v"), on=["u", "v"])
    return closed.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles"))


def cc_incremental(labels: DataFrame, new_edges: DataFrame,
                   src: str = "src", dst: str = "dst") -> DataFrame:
    """Fold NEW edges into an existing connected-components labeling
    without re-traversing the old graph — the append-only maintenance
    step a streaming near-dedup pipeline needs (new documents arrive,
    new similarity pairs appear; re-running CC over the full pair
    history is the thing that stops scaling first).

    Soundness: with canonical labels (component = min reachable node
    id, exactly what ``connected_components`` emits), contracting every
    old component to its label preserves connectivity — two old
    components merge iff a new edge connects them. So CC on the
    CONTRACTED graph (new edges mapped through the old labels;
    previously-unseen nodes stand for themselves) yields the merge
    relation, and its labels are again global minima because each old
    label IS the min of its component. One final join remaps every old
    node. Output: (node, comp) for all old + new nodes.

    Scale shape: the old labeling is touched by exactly TWO key
    shuffles (map new-edge endpoints through it; remap at the end) —
    cost proportional to |labels| + |new edges|, NOT to the historical
    edge count. The inner CC runs on the contracted graph, whose size
    is bounded by 2·|new edges|.
    """
    e = (new_edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
                  .filter(F.col("a").isNotNull()
                          & F.col("b").isNotNull()))
    la = labels.select(F.col("node").alias("a"),
                       F.col("comp").alias("ca"))
    lb = labels.select(F.col("node").alias("b"),
                       F.col("comp").alias("cb"))
    contracted = (e.join(la, on="a", how="left")
                   .join(lb, on="b", how="left")
                   .select(F.coalesce("ca", "a").alias("src"),
                           F.coalesce("cb", "b").alias("dst")))
    meta = connected_components(contracted)          # contracted-size CC
    meta = meta.localCheckpoint(eager=True)
    # remap old labels through the merge relation; labels not touched by
    # any new edge keep their component
    m_old = meta.select(F.col("node").alias("comp"),
                        F.col("comp").alias("newc"))
    remapped = (labels.join(m_old, on="comp", how="left")
                      .select("node", F.coalesce("newc", "comp")
                              .alias("comp")))
    # nodes that appear only in the new edges: take their meta label
    # (every contraction representative is itself an old node id, so one
    # anti-join against the old node set isolates the genuinely new)
    new_nodes = (meta.join(labels.select(F.col("node")), on="node",
                           how="left_anti")
                     .select("node", "comp"))
    return remapped.unionByName(new_nodes)


def bfs_distances(edges: DataFrame, sources: DataFrame,
                  src: str = "src", dst: str = "dst",
                  node_col: str = "node", max_hops: int = 6) -> DataFrame:
    """Minimum hop distance from ANY source node, directed, bounded by
    ``max_hops`` — multi-source BFS (reachability-with-depth: "which
    documents sit within k link hops of the seed set", the crawl-depth /
    influence-radius query). Output: (node, dist), sources at dist 0;
    nodes farther than max_hops (or unreachable) are absent.

    Level-synchronous frontier expansion: each round joins the CURRENT
    frontier (nodes first reached last round — not the whole visited
    set) to the edge list and anti-joins already-visited nodes, so
    per-round work is frontier-out-degree, not |edges|·rounds. Exactly
    ``max_hops`` rounds with an early exit on an empty frontier. A
    visited node is never re-expanded — BFS's invariant that the first
    discovery IS the minimum distance makes min-merging unnecessary.

    Caching discipline (the pagerank pattern): intermediates use
    ``persist()`` — promptly releasable, where a localCheckpoint's
    blocks free only via GC (DataFrame.unpersist cannot touch them) —
    and only the RETURNED frame is an eager localCheckpoint (truncated
    lineage; caller owns it, GC frees it). Plan depth grows linearly
    with the bounded ``max_hops``, so persist's untruncated lineage is
    fine here, unlike CC's convergence loop.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")) \
             .filter(F.col("a") != F.col("b")).distinct().persist()
    frontier = sources.select(F.col(node_col).alias("node")).distinct() \
                      .withColumn("dist", F.lit(0)).persist()
    frontier.count()
    visited = frontier
    for hop in range(1, max_hops + 1):
        nxt = (frontier.join(e, frontier["node"] == e["a"])
                       .select(F.col("b").alias("node"),
                               (F.col("dist") + 1).alias("dist"))
                       .distinct()
                       .join(visited.select("node"), on="node",
                             how="left_anti")).persist()
        if not nxt.head(1):
            nxt.unpersist()
            break
        old_v, old_f = visited, frontier
        visited = visited.unionByName(nxt).persist()
        visited.count()
        frontier = nxt
        if old_f is not old_v:       # hop 1: frontier IS visited
            old_f.unpersist()
        old_v.unpersist()
    out = visited.localCheckpoint(eager=True)
    if frontier is not visited:
        frontier.unpersist()
    visited.unpersist()
    e.unpersist()
    return out


def weighted_distances(edges: DataFrame, sources: DataFrame,
                       src: str = "src", dst: str = "dst",
                       weight: str = "weight", node_col: str = "node",
                       max_hops: int = 6) -> DataFrame:
    """Minimum WEIGHTED distance from any source within ``max_hops``
    edges — bounded Bellman-Ford (the weighted sibling of
    bfs_distances: with weights, a later hop can improve an
    already-reached node, so each round MIN-MERGES instead of
    anti-joining the visited set).

    Each round relaxes every edge out of the nodes whose distance
    improved last round (the delta frontier — Bellman-Ford's standard
    worklist optimization) and merges candidates into the label table
    with a MIN aggregate. Terminates after max_hops rounds or when no
    distance improves. Negative weights are rejected: with a hop bound
    they would make "distance" path-length-dependent in a way
    min-merge cannot order. Output: (node, dist) exact integer
    weights. Caching discipline = bfs_distances (persist()
    intermediates — promptly releasable; localCheckpoint only the
    returned frame).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"),
                     F.col(weight).alias("w_raw"))
    # Input contract, ONE validation scan: fractional weights (a silent
    # cast('long') would truncate 2.7 to 2 and change shortest paths
    # without signal) and negative weights (hop-bounded min-merge
    # cannot order them) are both rejected from the same pass.
    bad = e.where((F.col("w_raw").cast("double")
                   != F.col("w_raw").cast("long").cast("double"))
                  | (F.col("w_raw") < 0)).head(1)
    if bad:
        w = bad[0]["w_raw"]
        raise ValueError(
            "negative edge weights are not supported" if w is not None
            and float(w) < 0 else
            "weighted_distances requires integral edge weights; "
            "scale fractional weights to integers before calling")
    e = e.select("a", "b", F.col("w_raw").cast("long").alias("w"))
    e = e.groupBy("a", "b").agg(F.min("w").alias("w")).persist()
    labels = sources.select(F.col(node_col).alias("node")).distinct() \
                    .withColumn("dist", F.lit(0).cast("long")).persist()
    labels.count()
    frontier = labels
    for _ in range(max_hops):
        cand = (frontier.join(e, frontier["node"] == e["a"])
                        .select(F.col("b").alias("node"),
                                (F.col("dist") + F.col("w"))
                                .alias("dist"))
                        .groupBy("node").agg(F.min("dist").alias("dist")))
        merged = (labels.unionByName(cand)
                        .groupBy("node").agg(F.min("dist").alias("dist"))
                        .persist())
        improved = (merged.join(
            labels.withColumnRenamed("dist", "__old"), on="node",
            how="left")
            .where(F.col("__old").isNull()
                   | (F.col("dist") < F.col("__old")))
            .select("node", "dist")).persist()
        improved.count()
        old_l, old_f = labels, frontier
        labels, frontier = merged, improved
        if old_f is not old_l:       # round 1: frontier IS labels
            old_f.unpersist()
        old_l.unpersist()
        if not frontier.head(1):
            break
    out = labels.localCheckpoint(eager=True)
    if frontier is not labels:
        frontier.unpersist()
    labels.unpersist()
    e.unpersist()
    return out


def label_propagation(edges: DataFrame, seeds: DataFrame,
                      src: str = "src", dst: str = "dst",
                      node_col: str = "node", label_col: str = "label",
                      n_iter: int = 3) -> DataFrame:
    """Semi-supervised label spreading: seed nodes carry known labels;
    each round, every still-UNLABELED node adopts the majority label
    among its labeled neighbors (ties break to the smallest label — the
    group_mode discipline), and a label once assigned is FINAL — no
    oscillation, so the result is deterministic and SQL-replayable
    (vote-updating LPA cascades ties order-dependently). The
    classify-the-unlabeled-corpus-from-a-small-golden-set primitive
    (domain labels, language labels, spam verdicts) on the similarity
    graph the dedup pipeline already builds.

    Fixed ``n_iter`` rounds — labels reach n_iter hops from the seeds.
    Per round: one key shuffle to attach neighbor labels to the
    unlabeled frontier, one map-side-combined (node, label) count, one
    bounded max-count join + MIN tiebreak; localCheckpoint per round
    (CC lineage pattern); intermediates release, the returned labeling
    stays cached (caller owns it). Output: (node, label, is_seed) —
    nodes farther than n_iter hops from every seed are absent.
    """
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
                .union(edges.select(F.col(dst).alias("a"),
                                    F.col(src).alias("b")))
                .filter(F.col("a") != F.col("b"))
                .distinct()).persist()
    seed = (seeds.select(F.col(node_col).alias("node"),
                         F.col(label_col).alias("label"))
                 .dropDuplicates(["node"]))
    labels = seed.withColumn("is_seed", F.lit(True)).persist()
    labels.count()
    for _ in range(n_iter):
        nbr = (sym.join(labels.select(F.col("node").alias("b"),
                                      F.col("label")), on="b")
                  .join(labels.select("node"),
                        sym["a"] == F.col("node"), how="left_anti")
                  .groupBy(F.col("a").alias("node"), "label")
                  .agg(F.count(F.lit(1)).alias("__c")))
        top = nbr.groupBy("node").agg(F.max("__c").alias("__mc"))
        vote = (nbr.join(top.withColumnRenamed("node", "__tn"),
                         (nbr["node"] == F.col("__tn"))
                         & (nbr["__c"] == F.col("__mc")))
                   .groupBy(nbr["node"])
                   .agg(F.min("label").alias("label"))
                   .withColumn("is_seed", F.lit(False)))
        old = labels
        labels = labels.unionByName(vote).persist()
        labels.count()
        old.unpersist()
    out = labels.localCheckpoint(eager=True)
    labels.unpersist()
    sym.unpersist()
    return out
