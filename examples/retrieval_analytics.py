"""Retrieval + event-analytics pipeline on the spork_spark engine — the
round-4 operator family composed end-to-end, on the sf0.001 fixtures:

  inverted index (postings + doc_freq) → BM25 ranking for a query →
  decontamination-style doc pull of the top hits → multi-grain time
  rollup of the events stream (the hypertable cascade) → per-type
  distinct-user sketch check → parquet out

Run:  python examples/retrieval_analytics.py [sf_dir] [out_dir]
Every stage is native DataFrame work (docs/SCALE.md has the shuffle
analysis: single raw shuffle for the rollup cascade, pre-explode token
filtering for BM25, map-side-combined tf for the index).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spork_spark import get_spark
from spork_spark.operators import bm25_scores, inverted_index, time_rollup


def run(spark, sf_dir: str, out_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    # 1. corpus index: (token, doc, tf, doc_freq), rare tokens pruned
    index = inverted_index(docs, min_df=2)
    index.write.mode("overwrite").parquet(f"{out_dir}/index")

    # 2. rank the corpus for a query; keep the top 20 with their text
    query = ["data", "model", "training"]
    top = (bm25_scores(docs, query)
           .orderBy(F.desc("bm25"), "doc_id").limit(20)
           .join(docs.select("doc_id", "source", "text"), on="doc_id"))
    top.write.mode("overwrite").parquet(f"{out_dir}/top_hits")

    # 3. event analytics: hour+day rollup in one raw shuffle
    rollup = time_rollup(events, ts_col="ts", dims=("event_type",),
                         value_col="value", grains=("hour", "day"))
    rollup.write.mode("overwrite").partitionBy("grain") \
          .parquet(f"{out_dir}/rollup")

    # 4. sanity: per-type distinct users, sketch vs exact
    sketch = (events.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("n_exact"),
                   F.approx_count_distinct("user_id", rsd=0.01)
                    .alias("n_approx")))

    # count the WRITTEN parquet, not the lazy pipelines — re-counting the
    # un-persisted DataFrames would re-run every shuffle a second time
    n_idx = spark.read.parquet(f"{out_dir}/index").count()
    n_top = spark.read.parquet(f"{out_dir}/top_hits").count()
    n_roll = spark.read.parquet(f"{out_dir}/rollup").count()
    drift = sketch.agg(F.max(F.abs(F.col("n_approx") - F.col("n_exact"))
                             / F.col("n_exact"))).first()[0]
    print(f"index postings: {n_idx}; top hits: {n_top}; "
          f"rollup rows: {n_roll}; max sketch drift: {drift:.4f}")
    assert n_top > 0 and n_roll > 0 and drift <= 0.05
    return n_idx, n_top, n_roll


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark(app_name="retrieval-analytics", data_dir=sf)
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sf, out)
    print(f"outputs under {out}")
