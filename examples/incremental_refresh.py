"""Incremental corpus + event-analytics refresh — the round-4 session
operators composed end-to-end on the sf0.001 fixtures:

  MERGE-upsert a change batch into the document snapshot (broadcast
  anti-join, snapshot never shuffles) → ExactSubstr duplicate-span scan
  over the refreshed corpus (content-defined winnowing anchors) → drop
  over-duplicated docs → conversion funnel + SCD2 status history +
  exact heavy hitters over the event log → parquet out.

Run:  python examples/incremental_refresh.py [sf_dir] [out_dir]
The shuffle story for every stage is in docs/SCALE.md: the snapshot
side of the merge is exchange-free, duplicate_spans is one span-hash
shuffle over 32-byte hashes, funnel state is one row per user, SCD2's
two windows share a single key exchange, and heavy hitters counts only
Misra-Gries candidates.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spork_spark import get_spark
from spork_spark.operators import (duplicate_spans, funnel, heavy_hitters,
                                   merge_upsert, scd2_from_log)


def run(spark, sf_dir: str, out_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    # 1. a day's "crawl": re-ingest every 10th doc with fresh text and
    #    append a small batch of brand-new docs
    updates = (docs.where(F.col("doc_id") % 10 == 0)
                   .withColumn("text", F.concat(F.lit("refreshed: "),
                                                F.col("text"))))
    inserts = (docs.where(F.col("doc_id") % 97 == 0)
                   .withColumn("doc_id", F.col("doc_id") + 1_000_000))
    snapshot = merge_upsert(docs, updates.unionByName(inserts), ["doc_id"])
    snapshot.write.mode("overwrite").parquet(f"{out_dir}/snapshot")
    snapshot = spark.read.parquet(f"{out_dir}/snapshot")

    # 2. dedup pass: flag docs whose sampled 50-char spans are mostly
    #    copies of other docs, keep the clean ones
    spans = duplicate_spans(snapshot, "doc_id", "text")
    clean = snapshot.join(spans.where("keep").select("doc_id"), "doc_id")
    clean.write.mode("overwrite").parquet(f"{out_dir}/clean")

    # 3. event analytics over the same refresh window
    conv = funnel(events, "user_id", "ts", "event_type",
                  ["view", "click", "purchase"])
    hist = scd2_from_log(events.select("user_id", "ts", "event_type"),
                         "user_id", "ts", ["event_type"])
    hot = heavy_hitters(events.select("event_type"), "event_type",
                        min_frac=0.10)
    conv.write.mode("overwrite").parquet(f"{out_dir}/funnel")
    hist.write.mode("overwrite").parquet(f"{out_dir}/scd2")

    n_snap = snapshot.count()
    n_clean = spark.read.parquet(f"{out_dir}/clean").count()
    steps = {r.step: r.n_users for r in
             spark.read.parquet(f"{out_dir}/funnel").collect()}
    n_hist = spark.read.parquet(f"{out_dir}/scd2").count()
    n_hot = hot.count()
    print(f"snapshot: {n_snap} docs ({n_snap - docs.count()} inserted); "
          f"clean after span-dedup: {n_clean}; funnel: {steps}; "
          f"scd2 rows: {n_hist}; heavy event types: {n_hot}")
    assert n_clean <= n_snap and steps["view"] >= steps["purchase"]
    assert n_hist > 0 and n_hot > 0
    return n_snap, n_clean, steps


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark(app_name="incremental-refresh", data_dir=sf)
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sf, out)
    print(f"outputs under {out}")
