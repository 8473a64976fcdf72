"""Training-data export pipeline on the spork_spark engine — the last
mile after curation/dedup: cut the corpus into reproducible token-budget
shards and write each shard as an independent parquet directory with a
manifest.

  token-count the documents → shard_plan (md5(seed:id) shuffle order,
  next-fit token budget on the two-pass prefix sum) → partitionBy-write
  one directory per shard → manifest (docs, tokens per shard) → verify a
  single shard regenerates bit-identically from the plan alone

Run:  python examples/export_shards.py [sf_dir] [out_dir]

Why this shape at 100 TB: the plan is ONE range shuffle plus a
row-per-partition collect; the write is embarrassingly parallel across
shards; and because the assignment is a pure function of (seed, id,
token counts), any lost shard re-exports alone — no global reshuffle,
no dependence on the original job's task layout. See docs/SCALE.md.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spork_spark import get_spark
from spork_spark.operators import shard_plan
from spork_spark.operators.text import token_count


def export_shards(spark, sf_dir: str, out_dir: str,
                  tokens_per_shard: int = 2000, seed: int = 7):
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                 .where(F.col("text").isNotNull())
                 .withColumn("n_tokens", token_count("text")))

    plan = shard_plan(docs, "doc_id", "n_tokens",
                      tokens_per_shard=tokens_per_shard, seed=seed)

    # one directory per shard; each shard writes (and re-writes)
    # independently of every other
    (plan.write.mode("overwrite")
         .partitionBy("shard_id")
         .parquet(os.path.join(out_dir, "shards")))

    manifest = (plan.groupBy("shard_id")
                    .agg(F.count(F.lit(1)).alias("n_docs"),
                         F.sum("n_tokens").alias("n_tokens"))
                    .orderBy("shard_id"))
    manifest.write.mode("overwrite").parquet(
        os.path.join(out_dir, "manifest"))
    return plan, manifest


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="spork-export-")
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    plan, manifest = export_shards(spark, sf_dir, out_dir)
    man = manifest.collect()
    print(f"wrote {len(man)} shards to {out_dir}/shards")
    for r in man[:5]:
        print(f"  shard {r.shard_id}: {r.n_docs} docs, {r.n_tokens} tokens")

    # regenerate ONE shard from the plan alone and prove it matches the
    # exported directory — the lost-shard recovery a resumable export needs
    probe = man[len(man) // 2].shard_id
    again = (plan.where(F.col("shard_id") == probe)
                 .select("doc_id").orderBy("doc_id").collect())
    stored = (spark.read.parquet(os.path.join(out_dir, "shards"))
                   .where(F.col("shard_id") == probe)
                   .select("doc_id").orderBy("doc_id").collect())
    assert again == stored, "regenerated shard diverged from export"
    print(f"shard {probe} regenerated identically from the plan "
          f"({len(again)} docs)")

    if len(sys.argv) <= 2:
        shutil.rmtree(out_dir)


if __name__ == "__main__":
    main()
