"""Semantic (embedding-space) dedup pipeline on the spork_spark engine —
the vector-side counterpart of examples/corpus_curation.py:

  int8-quantize embeddings (4× storage) → SRP-LSH near-dup candidate
  pairs on the dequantized vectors → connected components → one survivor
  per duplicate cluster → ANN sanity probe on the survivors

Run:  python examples/semantic_dedup.py [sf_dir]
Every stage is a native DataFrame transformation; see docs/SCALE.md for
the shuffle analysis (LSH bucketing is the sub-quadratic path, component
rounds are two key-shuffles each).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spork_spark import get_spark
from spork_spark.operators import (brute_force_topk, connected_components,
                                   dequantize_embeddings,
                                   embedding_dedup_pairs, quantize_embeddings)


def semantic_dedup(spark, sf_dir: str, threshold: float = 0.45):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. quantize for storage/bandwidth; dequantize for the metric stages
    q = quantize_embeddings(emb, "embedding")
    vecs = dequantize_embeddings(q.drop("embedding"), out_col="embedding")

    # 2. near-duplicate candidate pairs in embedding space (SRP-LSH
    #    buckets, exact cosine verify on candidates only)
    pairs = embedding_dedup_pairs(vecs, "vec_id", "embedding",
                                  threshold=threshold, method="lsh")

    # 3. transitivity-closed clusters → keep the min id per cluster
    comp = connected_components(pairs, "id_a", "id_b")
    losers = comp.filter(F.col("node") != F.col("comp")) \
                 .select(F.col("node").alias("vec_id"))
    survivors = vecs.join(losers, on="vec_id", how="left_anti")

    # 4. sanity probe: top-3 neighbours of the first surviving vector
    probe = brute_force_topk(survivors,
                             survivors.orderBy("vec_id").limit(1), k=3,
                             vec_col="embedding")
    return survivors, probe


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="semantic-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    survivors, probe = semantic_dedup(spark, sf)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    n_in = emb.count()
    n_out = survivors.count()
    print(f"semantic dedup (LSH+CC): {n_in} vectors -> {n_out} survivors "
          f"({n_in - n_out} near-duplicates removed)")
    probe.show(truncate=False)

    # Alternative path: SemDeDup (k-means clusters, intra-cluster prune) —
    # deterministic integer arithmetic, pair space bounded per cluster;
    # compare the two strategies' removal counts at the same threshold.
    from spork_spark.operators import semantic_dedup as semdedup_op
    n_sd = semdedup_op(emb, threshold=0.45, k=8, n_iter=2).count()
    print(f"SemDeDup (k-means, same threshold): {n_in} -> {n_sd} survivors")
