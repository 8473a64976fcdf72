"""Connected components + end-to-end near-dedup (the cluster-assignment
stage between "similar pairs" and "one survivor per cluster")."""

import random

import pytest

from spork_spark.operators import connected_components, near_dedup


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    comp = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


def test_cc_chain_converges_logarithmically(spark):
    """500-node chain: plain min-propagation needs 500 rounds; pointer
    jumping must converge inside max_iter=15 (O(log n))."""
    edges = spark.createDataFrame([(i, i + 1) for i in range(499)],
                                  "src long, dst long")
    out = connected_components(edges, max_iter=15)
    rows = out.collect()
    assert len(rows) == 500
    assert all(r.comp == 0 for r in rows)


def test_cc_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    sdf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.comp for r in connected_components(sdf).collect()}
    want = _uf_components(n, edges)
    touched = {a for a, _ in edges} | {b for _, b in edges}
    assert got == {v: want[v] for v in touched}


def test_near_dedup_closes_transitivity(spark, eng):
    """A≈B and B≈C but A≉C directly: the component step must still drop
    both B and C, keeping only A (pair-level dedup alone can't)."""
    base = "the quick brown fox jumps over the lazy dog " * 4
    docs = spark.createDataFrame(
        [(0, base + "alpha beta gamma delta"),
         (1, base + "alpha beta gamma DELTA x"),       # ≈ 0
         (2, base + "alpha beta GAMMA DELTA x y"),     # ≈ 1, farther from 0
         (3, "completely different content about spark engines and ions"),
         (4, base + "alpha beta gamma delta")],        # exact dup of 0
        "doc_id long, text string")
    kept = near_dedup(docs, "doc_id", "text", threshold=0.6)
    ids = sorted(r.doc_id for r in kept.collect())
    assert 3 in ids and 0 in ids
    assert 4 not in ids                  # exact dup dropped
    assert ids == [0, 3]                 # 1 and 2 pulled in transitively


def test_cc_string_node_ids(spark):
    """Non-numeric node ids: the convergence detector must not bail after
    one round (a plain sum(label) is NULL for strings). 6-hop chain of
    doc-name nodes must fully converge."""
    names = [f"doc_{c}" for c in "abcdefg"]
    edges = spark.createDataFrame(
        [(names[i], names[i + 1]) for i in range(6)], "src string, dst string")
    out = {r.node: r.comp for r in
           connected_components(edges, max_iter=10).collect()}
    assert set(out.values()) == {"doc_a"}


def test_near_dedup_clean_corpus_no_pairs(spark):
    """A corpus with no near-duplicates produces an empty pair set; the
    component stage must handle zero edges and return every doc."""
    docs = spark.createDataFrame(
        [(1, "completely unique first document about engines"),
         (2, "a second text concerning very different gardening topics")],
        "doc_id long, text string")
    kept = near_dedup(docs, "doc_id", "text", threshold=0.9)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2]
    # connected_components on an explicitly empty edge set
    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty).count() == 0


def test_near_dedup_keep_longest(spark):
    """keep='longest': the most complete copy survives, not the min id."""
    base = "shared content that is clearly near duplicated " * 4
    docs = spark.createDataFrame(
        [(0, base),                      # shorter copy, min id
         (1, base + "plus an ending"),
         (2, "a different document entirely about other things")],
        "doc_id long, text string")
    kept = near_dedup(docs, "doc_id", "text", threshold=0.6,
                      keep="longest")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2]


def test_triangle_count_vs_bruteforce(spark):
    """Degree-ordered triangle counting == brute-force enumeration on a
    random graph (hubs included so orientation actually matters)."""
    from itertools import combinations
    from spork_spark.operators.graph import triangle_count
    rnd = random.Random(11)
    n = 40
    edges = {(i, j) for i in range(n) for j in range(i + 1, n)
             if rnd.random() < 0.15}
    edges |= {(0, j) for j in range(1, 20)}          # hub node
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = triangle_count(df).collect()[0].n_triangles
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    want = sum(1 for a, b, c in combinations(range(n), 3)
               if b in adj[a] and c in adj[a] and c in adj[b])
    assert got == want and want > 0


def test_triangle_count_ignores_duplicates_loops_direction(spark):
    from spork_spark.operators.graph import triangle_count
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)],
        "src long, dst long")
    # one triangle {1,2,3}; reversed/duplicate edges and the self-loop
    # must not inflate the count
    assert triangle_count(df).collect()[0].n_triangles == 1


def test_pagerank_star_graph_center_wins(spark):
    """Spokes -> center: the center accumulates damped mass, spokes
    keep only the teleport share; total mass is conserved up to
    integer-truncation dust."""
    from spork_spark.operators.graph import pagerank
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "src bigint, dst bigint")
    out = {r.node: r.rank_units for r in pagerank(edges, n_iter=3).collect()}
    assert len(out) == 6
    assert out[0] > out[1] and len({out[i] for i in range(1, 6)}) == 1
    total = sum(out.values())
    assert 0 <= 10 ** 12 - total < 600    # truncation dust only


def test_pagerank_is_deterministic_across_partitionings(spark):
    from spork_spark.operators.graph import pagerank
    edges = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(200)] +
        [(i, i + 1) for i in range(100)], "src bigint, dst bigint")
    a = {(r.node, r.rank_units)
         for r in pagerank(edges, n_iter=3).collect()}
    b = {(r.node, r.rank_units)
         for r in pagerank(edges.repartition(13), n_iter=3).collect()}
    assert a == b


def test_pagerank_leaves_no_cached_tables(spark):
    """The per-round persists must all unpersist. The RETURNED frame is
    an eager localCheckpoint whose blocks free only via py4j detach +
    JVM GC + the async ContextCleaner — arbitrarily later on this
    runtime (tools/soak.py classifies exactly these as
    pending_gc_blocks, not strong leaks) — so the deterministic
    contract to pin is: nothing BEYOND the one returned frame stays
    cached."""
    from spork_spark.operators.graph import pagerank
    edges = spark.createDataFrame([(1, 2), (2, 3)],
                                  "src bigint, dst bigint")
    import time
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    out = pagerank(edges, n_iter=2)
    out.count()
    # DataFrame.unpersist(blocking=False) completes on an async thread:
    # poll briefly for the per-round unpersists to land (the returned
    # checkpoint itself is exempted by the +1)
    for _ in range(40):
        after = len(spark.sparkContext._jsc.getPersistentRDDs())
        if after <= before + 1:
            break
        time.sleep(0.25)
    assert after <= before + 1


def test_cc_incremental_merges_components(spark):
    """Old graph {1-2} {3-4}; new edge 2-3 merges them; new edge 5-6
    opens a fresh component. Result must equal CC over the union."""
    from spork_spark.operators.graph import (cc_incremental,
                                             connected_components)
    old = spark.createDataFrame([(1, 2), (3, 4)], "src bigint, dst bigint")
    new = spark.createDataFrame([(2, 3), (5, 6)], "src bigint, dst bigint")
    labels = connected_components(old)
    got = {(r.node, r.comp) for r in
           cc_incremental(labels, new).collect()}
    want = {(r.node, r.comp) for r in
            connected_components(old.union(new)).collect()}
    assert got == want
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 5)}


def test_cc_incremental_internal_edges_are_noops(spark):
    from spork_spark.operators.graph import (cc_incremental,
                                             connected_components)
    old = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    labels = connected_components(old)
    new = spark.createDataFrame([(1, 3)], "src bigint, dst bigint")
    got = {(r.node, r.comp) for r in
           cc_incremental(labels, new).collect()}
    assert got == {(r.node, r.comp) for r in labels.collect()}


def test_cc_incremental_chains(spark):
    """Two successive increments equal one CC over everything."""
    from spork_spark.operators.graph import (cc_incremental,
                                             connected_components)
    e0 = spark.createDataFrame([(10, 20), (30, 40), (50, 60)],
                               "src bigint, dst bigint")
    e1 = spark.createDataFrame([(20, 30)], "src bigint, dst bigint")
    e2 = spark.createDataFrame([(40, 50), (70, 80)],
                               "src bigint, dst bigint")
    lab = cc_incremental(cc_incremental(connected_components(e0), e1), e2)
    got = {(r.node, r.comp) for r in lab.collect()}
    want = {(r.node, r.comp) for r in
            connected_components(e0.union(e1).union(e2)).collect()}
    assert got == want


def test_bfs_distances_multi_source_min_hops(spark):
    from spork_spark.operators import bfs_distances
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 3), (6, 6), (7, 8)],
        "src bigint, dst bigint")
    sources = spark.createDataFrame([(1,), (10,)], "node bigint")
    out = {r.node: r.dist for r in
           bfs_distances(edges, sources, max_hops=3).collect()}
    # 3 is 1 hop from source 10 (not 2 hops from source 1)
    assert out == {1: 0, 10: 0, 2: 1, 3: 1, 4: 2, 5: 3}
    # 7->8 unreachable from sources; self-loop 6 ignored


def test_bfs_distances_hop_bound_and_no_revisit(spark):
    from spork_spark.operators import bfs_distances
    # cycle: BFS must terminate and keep first-discovery distances
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src bigint, dst bigint")
    sources = spark.createDataFrame([(1,)], "node bigint")
    out = {r.node: r.dist for r in
           bfs_distances(edges, sources, max_hops=10).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}
    shallow = {r.node: r.dist for r in
               bfs_distances(edges, sources, max_hops=1).collect()}
    assert shallow == {1: 0, 2: 1}


def test_weighted_distances_prefers_cheaper_longer_path(spark):
    from spork_spark.operators import weighted_distances
    edges = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (3, 2, 1),    # 1->3->2 (2) beats 1->2 (10)
         (2, 4, 5), (9, 9, 1)],
        "src bigint, dst bigint, weight bigint")
    sources = spark.createDataFrame([(1,)], "node bigint")
    out = {r.node: r.dist for r in
           weighted_distances(edges, sources, max_hops=4).collect()}
    assert out == {1: 0, 3: 1, 2: 2, 4: 7}


def test_weighted_distances_hop_bound_and_negative_reject(spark):
    import pytest
    from spork_spark.operators import weighted_distances
    edges = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (3, 2, 1)],
        "src bigint, dst bigint, weight bigint")
    sources = spark.createDataFrame([(1,)], "node bigint")
    one_hop = {r.node: r.dist for r in
               weighted_distances(edges, sources, max_hops=1).collect()}
    assert one_hop == {1: 0, 2: 10, 3: 1}    # cheaper 2-hop not yet found
    neg = spark.createDataFrame([(1, 2, -1)], "src bigint, dst bigint, weight bigint")
    with pytest.raises(ValueError):
        weighted_distances(neg, sources)


def test_bfs_and_bellman_ford_leave_only_returned_labels(spark):
    """Intermediate checkpoints (frontiers, edge snapshots) must all
    unpersist — only the returned labeling stays cached (the
    pagerank/CC contract, see that test for why returned checkpoints
    cannot be awaited); the returned frame must survive collection even
    when the FIRST expansion is empty (frontier IS the labels)."""
    from spork_spark.operators import bfs_distances, weighted_distances
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    isolated = spark.createDataFrame([(99,)], "node bigint")
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    outs = [bfs_distances(edges, isolated, max_hops=3),      # empty hop 1
            bfs_distances(edges, spark.createDataFrame([(1,)], "node bigint"),
                          max_hops=2),
            weighted_distances(
                edges.withColumn("weight", edges["dst"]),
                spark.createDataFrame([(1,)], "node bigint"), max_hops=2)]
    import time
    for o in outs:
        assert o.count() >= 1                     # collectable post-cleanup
    # DataFrame.unpersist(blocking=False) completes on an async thread:
    # poll briefly for the explicit intermediate unpersists to land (the
    # 3 returned checkpoints are exempted by the +3)
    for _ in range(40):
        after = len(spark.sparkContext._jsc.getPersistentRDDs())
        if after <= before + 3:
            break
        time.sleep(0.25)
    assert after <= before + 3           # only the 3 returned labelings


def test_label_propagation_spreads_and_ties_break_small(spark):
    from spork_spark.operators import label_propagation
    # chain 1-2-3-4-5; seeds: 1="a", 5="b"; node 3 ties -> "a"
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src bigint, dst bigint")
    seeds = spark.createDataFrame([(1, "a"), (5, "b")],
                                  "node bigint, label string")
    out = {r.node: (r.label, r.is_seed) for r in
           label_propagation(edges, seeds, n_iter=3).collect()}
    assert out[1] == ("a", True) and out[5] == ("b", True)
    assert out[2][0] == "a" and out[4][0] == "b"
    assert out[3][0] == "a"                      # tie -> smallest label
    assert not out[3][1]


def test_label_propagation_seeds_never_flip(spark):
    from spork_spark.operators import label_propagation
    # seed surrounded by opposite-label majority must keep its label
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src bigint, dst bigint")
    seeds = spark.createDataFrame(
        [(0, "z")] + [(i, "a") for i in range(1, 5)],
        "node bigint, label string")
    out = {r.node: r.label for r in
           label_propagation(edges, seeds, n_iter=2).collect()}
    assert out[0] == "z"
