"""End-to-end training-corpus curation pipeline on the spork_spark engine —
the composition a 100 TB curation job runs, on the sf0.001 fixtures:

  Gopher quality rules → exact dedup → near-dup removal (MinHash LSH →
  connected components → one survivor per duplicate CLUSTER) →
  benchmark decontamination → deterministic stratified sampling →
  cross-document sequence packing → parquet out

Run:  python examples/corpus_curation.py [sf_dir] [out_dir]
Every stage is a native DataFrame transformation (see docs/SCALE.md for
the shuffle analysis of each operator).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spork_spark import get_spark
from spork_spark.operators import (blocklist_filter, classifier_score,
                                   corpus_stats, decontaminate, exact_dedup,
                                   gopher_filter, near_dedup,
                                   pack_sequences, per_source_cap,
                                   scrub_pii, stratified_sample)


def curate(spark, sf_dir: str, out_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 0. source hygiene: blocklisted domains out (broadcast anti-join),
    #    then cap any single domain's share (WindowGroupLimit top-k)
    docs = blocklist_filter(docs, ["src13"])
    docs = per_source_cap(docs, cap=200, priority_col="n_chars")

    # 1. quality floor: Gopher rules (word count, word length, alpha
    #    ratio, stopword floor), audit column kept for removal-rate stats
    good = gopher_filter(docs, min_words=10, min_stopwords=0) \
        .filter(F.col("keep")).drop("keep", "drop_reason")

    # 1b. model-shaped quality gate: hashed-bigram linear classifier
    #     (shuffle-free; swap in trained weights without a plan change)
    scores = classifier_score(good).select("doc_id", "keep")
    good = good.join(scores.filter(F.col("keep")).drop("keep"),
                     on="doc_id", how="left_semi")

    # 2. exact dedup (survivor = min doc_id per text)
    deduped = exact_dedup(good, ["text"], keep="min", tiebreak="doc_id")

    # 3. near-dup removal, transitivity-closed: LSH pairs → connected
    #    components → keep min doc_id per duplicate cluster (A≈B≈C drops
    #    both B and C even when A and C aren't directly similar)
    uniq = near_dedup(deduped, "doc_id", "text", shingle_n=5,
                      num_hashes=64, bands=16, threshold=0.8)

    # 4. decontamination against a held-out benchmark slice
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    clean = decontaminate(uniq.filter(F.col("doc_id") % 97 != 0), bench,
                          n=8, mode="remove")

    # 4b. PII scrubbing before release (typed placeholders, audit count)
    clean = scrub_pii(clean)

    # 5. per-language downsampling (deterministic, rerunnable)
    sampled = stratified_sample(clean, "lang", {"en": 0.9}, "doc_id",
                                default_rate=0.5)

    # 6. pack into fixed 128-token training sequences
    packed = pack_sequences(sampled, seq_len=128, n_streams=8)

    packed.write.mode("overwrite").parquet(out_dir)

    # 7. dataset-card report on what survived (one HashAggregate)
    corpus_stats(sampled).orderBy("lang", "source").show(10)
    return packed


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else \
        tempfile.mkdtemp(prefix="spork_curated_")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    result = curate(spark, sf, out)
    n = spark.read.parquet(out).count()
    print(f"curated corpus written to {out}: {n} sequences")
