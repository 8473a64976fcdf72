"""Similarity search over embedding columns (array<float>).

Two paths, per the north star's scale mandate:

- brute_force_topk: exact cosine top-k. The query set is broadcast (small
  side); scores are computed JVM-side with zip_with/aggregate (no Python);
  per-query top-k via window row_number — one shuffle on query id. At
  100 TB this is the "scan" path: linear in corpus size, embarrassingly
  parallel, no index build.
- lsh_topk: random-hyperplane (signed random projection) LSH — corpus and
  queries hash to `bands` bucket keys; candidates pair by bucket equality
  (equi-join, broadcastable); exact cosine re-rank on candidates only.
  This is the sublinear path: the corpus-side work after bucketing touches
  only colliding vectors. An IVF variant (k-means coarse quantizer) would
  slot in the same way; hyperplane-LSH is chosen because it needs no
  training pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str | None = None,
                     score_round: int = 6) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Returns (query_id, vec_id, score, rank). Queries are broadcast; scoring
    is a narrow map over the corpus; one shuffle on query_id for top-k.
    Scores are computed in double and rounded to `score_round` BEFORE
    ranking, so rank boundaries are reproducible across engines.
    """
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("__qvec"))
    c = corpus.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("__cvec"))
    scored = (c.crossJoin(F.broadcast(q))
               .filter(F.col(id_col) != F.col("query_id"))
               .withColumn("score", F.round(
                   cosine(F.col("__cvec"), F.col("__qvec")), score_round)))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", id_col, "score", "rank"))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    import random
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


def _srp_bucket(vec, planes: list[list[float]]) -> "F.Column":
    """Signed-random-projection bucket id: one bit per hyperplane."""
    bits = [F.when(_dot(vec, F.array([F.lit(w) for w in p])) >= 0, 1)
             .otherwise(0).cast("long") for p in planes]
    acc = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        acc = acc + F.shiftleft(b, i)
    return acc


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, n_planes: int = 8, bands: int = 4,
             seed: int = 42, query_id_col: str | None = None) -> DataFrame:
    """Approximate cosine top-k: `bands` independent SRP hash tables;
    candidates = bucket collisions in any band; exact re-rank after.

    Recall improves with bands; cost scales with collision count, not
    corpus × queries. Same output schema as brute_force_topk.
    """
    qid = query_id_col or id_col
    tables = [_hyperplanes(dim, n_planes, seed + 101 * b)
              for b in range(bands)]

    def with_buckets(df, vname):
        out = df
        for b, planes in enumerate(tables):
            out = out.withColumn(f"__b{b}", _srp_bucket(F.col(vname), planes))
        return out

    # Double precision end-to-end and round-before-rank (below): bucket
    # signs and rank boundaries are then bit-reproducible in any engine
    # with IEEE doubles and left-to-right list reduction — which is what
    # makes this query exact-oracle-checkable, not rows-only.
    c = with_buckets(corpus.select(F.col(id_col),
                                   F.col(vec_col).cast("array<double>")
                                    .alias("__cvec")), "__cvec")
    q = with_buckets(queries.select(F.col(qid).alias("query_id"),
                                    F.col(vec_col).cast("array<double>")
                                     .alias("__qvec")), "__qvec")
    cand = None
    for b in range(bands):
        pairs = c.select(id_col, "__cvec", F.col(f"__b{b}").alias("__bk")) \
                 .join(F.broadcast(q.select("query_id", "__qvec",
                                            F.col(f"__b{b}").alias("__bk"))),
                       on="__bk") \
                 .select(id_col, "query_id", "__cvec", "__qvec")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = (cand.dropDuplicates([id_col, "query_id"])
                .filter(F.col(id_col) != F.col("query_id"))
                .withColumn("score", F.round(
                    cosine(F.col("__cvec"), F.col("__qvec")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col(id_col))
    return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", id_col, "score", "rank"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 16, nprobe: int = 4,
             query_id_col: str | None = None,
             score_round: int = 6) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer partitions
    the corpus into `n_centroids` cells; each query scans only its `nprobe`
    nearest cells.

    The coarse quantizer here is training-free and deterministic — the
    vectors of the `n_centroids` smallest ids act as seeds (a k-means
    refinement via applyInPandas would slot in without changing the plan).
    Cell assignment is a narrow map against the broadcast centroid list
    (argmax cosine); the probe is an equi-join on cell id, so post-bucketing
    work scales with |probed cells|, not |corpus|. nprobe = n_centroids
    degrades gracefully to exact brute force (used by the tests as the
    equivalence oracle).
    """
    qid = query_id_col or id_col
    cents = [(int(r[0]), [float(x) for x in r[1]])
             for r in corpus.select(id_col, vec_col)
                            .orderBy(id_col).limit(n_centroids).collect()]

    def cell_ranking(vec):
        """Array of cell ids sorted by descending cosine to `vec`."""
        scored = F.array(*[
            F.struct(cosine(vec, F.array([F.lit(x) for x in cvec]))
                      .alias("s"),
                     F.lit(cid).alias("cell"))
            for cid, cvec in cents])
        return F.transform(
            F.reverse(F.array_sort(scored)), lambda st: st["cell"])

    c = corpus.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("__cvec"))
    c = c.withColumn("__cell", cell_ranking(F.col("__cvec"))[0])
    q = queries.select(F.col(qid).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("__qvec"))
    q = q.withColumn("__cell",
                     F.explode(F.slice(cell_ranking(F.col("__qvec")), 1,
                                       min(nprobe, len(cents)))))
    scored = (c.join(F.broadcast(q), on="__cell")
               .filter(F.col(id_col) != F.col("query_id"))
               .withColumn("score", F.round(
                   cosine(F.col("__cvec"), F.col("__qvec")), score_round)))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", id_col, "score", "rank"))


def ivf_topk_trained(corpus: DataFrame, queries: DataFrame,
                     k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding", n_centroids: int = 4,
                     nprobe: int = 2, n_iter: int = 2, scale: int = 1000,
                     query_id_col: str | None = None,
                     score_round: int = 6,
                     label_col: str | None = None) -> DataFrame:
    """IVF approximate top-k with a k-means-TRAINED coarse quantizer
    (round-4 item 2: real recall depends on centroid quality, so the
    codebook comes from operators/curation.py kmeans_train instead of
    first-n seeding).

    Design for exactness AND scale:
    - Corpus cell assignment IS the k-means assignment (same integer
      squared-L2 metric over quantized codes the training used — no
      second assignment pass, no metric mismatch).
    - Query cell ranking uses the same integer metric against the
      trained codebook (a k-entry literal expression, k·dim bounded
      like the IVF seed pattern), probing the `nprobe` nearest cells.
    - Scoring is exact double cosine, rounded BEFORE ranking.
    Everything is deterministic and SQL-replayable (the kmeans
    recurrence itself is integer arithmetic), so recall against the
    brute-force path is exact-oracle-checkable, not rows-only.

    Scale shape: training is kmeans_train's bounded k-row collects; the
    probe is an equi-join on cell id with broadcast queries; corpus-side
    work after bucketing is |probed cells|, not |corpus|.

    ``label_col``: when set, only DIFFERENT-label candidates rank (and
    the label joins the output) — the IVF-bucketed hard-negative miner;
    see hard_negatives for the exact path it approximates.
    """
    from .curation import _quantize_vec, _sq_dist, kmeans_train
    qid = query_id_col or id_col
    cents, cells = kmeans_train(corpus, k=n_centroids, n_iter=n_iter,
                                id_col=id_col, vec_col=vec_col,
                                scale=scale)
    ccols = [F.col(id_col),
             F.col(vec_col).cast("array<double>").alias("__cvec")]
    qcols = [F.col(qid).alias("query_id"),
             F.col(vec_col).cast("array<double>").alias("__qvec"),
             _quantize_vec(vec_col, scale).alias("__qq")]
    if label_col is not None:
        ccols.append(F.col(label_col))
        qcols.append(F.col(label_col).alias("__qlabel"))
    c = (corpus.select(*ccols)
               .join(cells, on=id_col)
               .withColumnRenamed("cluster", "__cell"))
    q = queries.select(*qcols)
    scored_cells = F.array(*[
        F.struct(_sq_dist(F.col("__qq"),
                          F.array([F.lit(v) for v in codes])).alias("d"),
                 F.lit(cid).cast("long").alias("cid"))
        for cid, codes in cents])
    # struct sort = (distance, cid): deterministic tie-break to the
    # smaller cell id, same contract as the k-means assignment
    ranked = F.transform(F.array_sort(scored_cells), lambda s: s["cid"])
    q = q.withColumn("__cell", F.explode(
        F.slice(ranked, 1, min(nprobe, len(cents)))))
    qsel = ["query_id", "__qvec", "__cell"] \
        + (["__qlabel"] if label_col is not None else [])
    scored = (c.join(F.broadcast(q.select(*qsel)), on="__cell")
               .filter(F.col(id_col) != F.col("query_id"))
               .withColumn("score", F.round(
                   cosine(F.col("__cvec"), F.col("__qvec")),
                   score_round)))
    if label_col is not None:
        scored = scored.filter(F.col(label_col) != F.col("__qlabel"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col(id_col))
    out_cols = ["query_id", id_col] \
        + ([label_col] if label_col is not None else []) \
        + ["score", "rank"]
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(*out_cols))


def hard_negatives_ivf(df: DataFrame, anchors: DataFrame = None,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       label_col: str = "label", k: int = 5,
                       n_centroids: int = 4, nprobe: int = 2,
                       n_iter: int = 2, score_round: int = 4) -> DataFrame:
    """IVF-bucketed hard-negative mining — the 100 TB path for
    hard_negatives: candidates come from each anchor's `nprobe` nearest
    k-means-trained cells (equi-join on cell id, corpus-side work ∝
    probed cells, not corpus × anchors), different-label filtering and
    exact cosine re-ranking happen inside the probe. Recall vs the
    exact miner is the quality knob (nprobe → n_centroids degrades to
    exact); hard_negatives is the recall oracle, same relationship as
    brute_force_topk to ivf_topk. Output matches hard_negatives:
    (anchor_id, vec_id, label, score, rank).
    """
    anchors = df if anchors is None else anchors
    out = ivf_topk_trained(df, anchors, k=k, id_col=id_col,
                           vec_col=vec_col, n_centroids=n_centroids,
                           nprobe=nprobe, n_iter=n_iter,
                           score_round=score_round, label_col=label_col)
    return out.withColumnRenamed("query_id", "anchor_id")


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        out_col: str = "q_vec",
                        scale_col: str = "q_scale") -> DataFrame:
    """Symmetric int8 scalar quantization: q[i] = clamp(round(v[i]/s),
    -127..127) with per-vector scale s = max|v|/127 — the standard 4×
    storage/bandwidth reduction for embedding columns at 100 TB (a
    64-dim float32 vector becomes 64 bytes + one float scale).

    Pure Column HOFs (transform/array_max), deterministic half-up
    rounding (floor(x+0.5), portable to the SQL oracle), no Python.
    All-zero vectors get scale 0 and all-zero codes."""
    v = F.col(vec_col)
    mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    s = mx / F.lit(127.0)
    q = F.when(mx > 0, F.transform(
            v, lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127),
                        F.floor(x.cast("double") / s + 0.5).cast("int")))
            .cast("tinyint"))) \
         .otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return df.withColumn(out_col, q).withColumn(scale_col, s)


def dequantize_embeddings(df: DataFrame, q_col: str = "q_vec",
                          scale_col: str = "q_scale",
                          out_col: str = "embedding") -> DataFrame:
    """Inverse of quantize_embeddings: v[i] ≈ q[i] * s (float array).
    Reconstruction error is bounded by s/2 per element — cosine top-k on
    dequantized vectors matches the float ranking for all but
    hairline-close neighbors (re-rank the top candidates on the original
    vectors when exactness matters)."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col),
                    lambda x: (x.cast("double")
                               * F.col(scale_col)).cast("float")))


def hard_negatives(df: DataFrame, anchors: DataFrame = None,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label", k: int = 5,
                   score_round: int = 4) -> DataFrame:
    """Top-k nearest DIFFERENT-label neighbors per anchor — contrastive
    hard-negative mining, the training-pair construction step of an
    embedding-model pipeline (negatives that are close in vector space
    but wrong by label teach the margin; random negatives are too easy).

    Exact variant: anchors BROADCAST against the corpus (scoring is a
    narrow map over corpus partitions — the corpus never shuffles), one
    keyed shuffle ranks top-k per anchor. Scores round BEFORE ranking so
    rank boundaries replay in any engine. Anchor batches are the scale
    knob (cost ∝ corpus × anchors): at 100 TB mine per anchor batch, or
    pre-bucket candidates with ivf_topk's trained cells and re-rank —
    this exact path doubles as that pipeline's recall oracle, same
    relationship as brute_force_topk to ivf_topk.

    Output: (anchor_id, vec_id, label, score, rank).
    """
    anchors = df if anchors is None else anchors
    a = anchors.select(F.col(id_col).alias("anchor_id"),
                       F.col(vec_col).cast("array<double>").alias("__av"),
                       F.col(label_col).alias("__al"))
    from .dedup import _spread
    # _spread: the per-(corpus row × anchor) cosine kernel is a narrow
    # map over CORPUS partitions — a single-row-group scan would run
    # the whole corpus×anchors scoring on one core; identity at scale.
    c = _spread(df.select(F.col(id_col), F.col(label_col),
                          F.col(vec_col).cast("array<double>")
                           .alias("__cv")))
    scored = (c.crossJoin(F.broadcast(a))
               .filter((F.col(id_col) != F.col("anchor_id"))
                       & (F.col(label_col) != F.col("__al")))
               .withColumn("score", F.round(
                   cosine(F.col("__cv"), F.col("__av")), score_round)))
    w = Window.partitionBy("anchor_id").orderBy(F.col("score").desc(),
                                                F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("anchor_id", id_col, label_col, "score",
                          "rank"))
