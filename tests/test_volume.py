"""Volume tests: SURVEY.md §4.3's "genuinely hard" risk #1 — the escaping-
bag path must survive real group cardinality and bag sizes, not just toy
fixtures. Runs at sf0.1 (600k-row lineitem) on the shared local session.

The escaping bag compiles to collect_list → Spark plans an
ObjectHashAggregate (object-based agg buffers with spill-to-sort fallback
via spark.sql.objectHashAggregate.sortBased.fallbackThreshold), the same
memory-safety role as the reference's SelfSpillBag/InternalCachedBag
(pig:src/org/apache/pig/data/SelfSpillBag.java)."""

import pytest

from spork_spark import col, fn, flatten

SF = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def li(eng):
    return eng.load(f"{SF}/lineitem.parquet", alias="li_vol")


def _plan(rel) -> str:
    return rel.df()._jdf.queryExecution().executedPlan().toString()


def test_escaping_bag_at_volume_uses_object_hash_agg(eng, li):
    """~150k groups (l_orderkey), whole-row bags, bag escapes via FLATTEN:
    must plan ObjectHashAggregate (spillable object buffers) and complete;
    the explode restores the input row count exactly."""
    g = li.group_by(col("l_orderkey"))
    bagged = g.foreach(col("group").alias("okey"),
                       col("li_vol").alias("bag"))
    p = _plan(bagged)
    assert "collect_list" in p and "ObjectHashAggregate" in p
    exploded = bagged.foreach(col("okey"), flatten(col("bag")))
    n = exploded.df().count()
    assert n == li.df().count()


def test_escaping_bag_inner_sort_at_volume(eng, li):
    """Secondary-sort shape at volume: per-order bag sorted by quantity,
    top-1 via LIMIT_BAG — the nested-FOREACH ORDER/LIMIT path (SURVEY §2.3
    mapping #1) over 150k real groups; validates against a window top-1."""
    g = li.group_by(col("l_orderkey"))
    top1 = g.foreach(
        col("group").alias("okey"),
        fn("LIMIT_BAG",
           fn("SORT_BAG", col("li_vol"), "l_quantity", False), 1).alias("b"))
    picked = top1.foreach(col("okey"), flatten(col("b")))
    got = picked.df().selectExpr("okey", "l_quantity")
    from pyspark.sql import functions as F, Window
    w = Window.partitionBy("l_orderkey").orderBy(F.desc("l_quantity"))
    exp = (li.df().withColumn("rn", F.row_number().over(w))
           .filter("rn = 1").select("l_orderkey", "l_quantity"))
    # max quantity per order must agree (ties make row identity ambiguous,
    # so compare the quantity aggregate, not full rows)
    a = {r[0]: r[1] for r in got.collect()}
    b = {r[0]: r[1] for r in exp.collect()}
    assert a == b


def test_connected_components_at_volume(eng, li):
    """CC over a real bipartite graph: 60k lineitem edges at sf0.01
    (orderkey ↔ partkey+OFFSET). Pins that per-round localCheckpoint
    keeps the iteration count and lineage bounded at real edge counts,
    and that labels are consistent: every edge's two endpoints land in
    the same component."""
    from pyspark.sql import functions as F

    from spork_spark.operators import connected_components
    edges = (eng.spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
             .select(F.col("l_orderkey").alias("src"),
                     (F.col("l_partkey") + 10_000_000).alias("dst")))
    comp = connected_components(edges, max_iter=25)
    labels = comp.withColumnRenamed("node", "src") \
                 .withColumnRenamed("comp", "c_src")
    rlabels = comp.withColumnRenamed("node", "dst") \
                  .withColumnRenamed("comp", "c_dst")
    bad = (edges.join(labels, on="src").join(rlabels, on="dst")
                .filter(F.col("c_src") != F.col("c_dst")).count())
    assert bad == 0
    n_nodes = comp.count()
    n_comps = comp.select("comp").distinct().count()
    assert n_comps < n_nodes          # bipartite graph actually merged


def test_curation_ops_at_volume(spark):
    """Round-4 curation ops over the sf0.1 fixtures (5k docs / 2k vecs on
    the shared 4-core session): k-means stays deterministic at 10× the
    oracle fixture size, SemDeDup completes with bounded intra-cluster
    pair work, and the shuffle-free classifier scores every doc."""
    from spork_spark.operators import (classifier_score, kmeans_quantized,
                                       ngram_logcount_score, semantic_dedup)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    assert classifier_score(docs).count() == docs.count()

    scored = ngram_logcount_score(docs)
    assert scored.count() > 0.9 * docs.count()   # only gram-less docs drop

    a = kmeans_quantized(emb, k=8, n_iter=2).collect()
    b = kmeans_quantized(emb, k=8, n_iter=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == emb.count()

    kept = semantic_dedup(emb, threshold=0.45, k=8, n_iter=2).count()
    assert 0 < kept <= emb.count()
