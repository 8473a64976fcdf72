"""ANN retrieval-quality artifact (round-7 item #3): recall@k of the
approximate similarity paths vs the exact brute-force path on the sf1
embeddings (20k vectors, dim 64), over the tuning grid a user of
SURVEY §2.11's SIMILARITY_SEARCH actually turns:

  - lsh_topk: bands ∈ {2, 4, 8, 16} (n_planes=8) — recall rises with
    bands, cost with collision count.
  - ivf_topk_trained: n_centroids=16 k-means codebook, nprobe ∈
    {1, 2, 4, 8, 16} — nprobe=n_centroids degrades to exact.

recall@k(config) = mean over queries of |approx top-k ∩ exact top-k|/k.
Ground truth and all variants use the same deterministic queries
(every 200th vec_id → 100 queries) and the same round-before-rank
scoring, so the artifact is reproducible bit-for-bit. Wall times are
warm single-shot (the grid is the point here, not the bench protocol).

Writes docs/RECALL_sf1.json. Usage: python tools/recall_sf1.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
K = 10
QUERY_EVERY = 200           # 20k vectors -> 100 queries


def topk_sets(df):
    """{query_id: frozenset(top-k vec_ids)} + wall time of the collect."""
    t0 = time.perf_counter()
    rows = df.collect()
    sec = time.perf_counter() - t0
    out: dict = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out, round(sec, 4)


def recall(approx: dict, exact: dict) -> float:
    tot = sum(len(approx.get(q, set()) & hits) / len(hits)
              for q, hits in exact.items())
    return round(tot / len(exact), 4)


def main() -> None:
    from pyspark.sql import functions as F
    from spork_spark import get_spark
    from spork_spark.operators.similarity import (brute_force_topk,
                                                  ivf_topk_trained,
                                                  lsh_topk)

    spark = get_spark(master="local[32]", extra_conf={
        "spark.sql.shuffle.partitions": "32"})
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") % QUERY_EVERY == 0)
    n_corpus, n_q = corpus.count(), queries.count()

    exact, bf_sec = topk_sets(brute_force_topk(corpus, queries, k=K))
    # warm rerun for the quoted time (first run pays JVM/codegen)
    exact, bf_sec = topk_sets(brute_force_topk(corpus, queries, k=K))

    out = {"sf_dir": SF, "k": K, "n_corpus": n_corpus, "n_queries": n_q,
           "dim": 64, "bruteforce_sec": bf_sec,
           "protocol": f"queries = vec_id % {QUERY_EVERY} == 0; "
                       "recall@k vs brute_force_topk on identical "
                       "round-before-rank scores; warm single-shot times",
           "note": "recall is corpus-density-dependent: the same "
                   "configs on the sparse sf0.01 corpus (500 vectors) "
                   "measure lsh(bands=8)=0.10, ivf(nprobe=4)=0.58 — "
                   "bucketing needs neighbors to actually be near; "
                   "tune bands/nprobe per corpus, and gate recall on "
                   "YOUR data before shipping an index config",
           "lsh": [], "ivf_trained": []}

    for bands in (2, 4, 8, 16):
        approx, sec = topk_sets(lsh_topk(corpus, queries, k=K,
                                         dim=64, n_planes=8, bands=bands))
        out["lsh"].append({"bands": bands, "n_planes": 8,
                           "recall_at_k": recall(approx, exact),
                           "sec": sec})
        print("lsh", out["lsh"][-1], flush=True)

    for nprobe in (1, 2, 4, 8, 16):
        approx, sec = topk_sets(ivf_topk_trained(
            corpus, queries, k=K, n_centroids=16, nprobe=nprobe,
            n_iter=2))
        out["ivf_trained"].append({"n_centroids": 16, "nprobe": nprobe,
                                   "recall_at_k": recall(approx, exact),
                                   "sec": sec})
        print("ivf", out["ivf_trained"][-1], flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "RECALL_sf1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("lsh", "ivf_trained")}, indent=1))


if __name__ == "__main__":
    main()
