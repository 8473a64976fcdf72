"""Stage-level profile of q_containment at a given SF (guide §1):
times each sub-stage of containment_pairs through the noop sink and
counts the row volumes that decide whether a PPJoin prefix filter can
beat the weighted-list expansion.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F, Window
from spork_spark import get_spark
from spork_spark.operators.dedup import (
    _exact_text_groups, _shingle_instances, _spread)


def noop_time(df, label, spark):
    spark.sparkContext.setJobDescription(label)
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[32]",
                      extra_conf={**bench.LATENCY_PROFILE,
                                  "spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    id_col, text_col, n, threshold = "doc_id", "text", 8, 0.6
    max_df_frac, max_df_floor = 0.1, 50

    df = _spread(docs.select(id_col, text_col))
    members, uniq = _exact_text_groups(df, id_col, text_col)
    gsz = members.where(F.col(id_col) == F.col("__gid")) \
                 .select(F.col(id_col), F.col("__gn"))
    ex = (_shingle_instances(uniq.select(id_col, text_col),
                             id_col, text_col, n)
          .dropDuplicates([id_col, "__s"])
          .withColumnRenamed("__s", "__g")
          .join(gsz, on=id_col))
    kept = ex.withColumn("__df", F.sum("__gn").over(Window.partitionBy("__g")))
    cap = (df.where(F.col(text_col).isNotNull())
             .agg(F.greatest(
                 F.lit(int(max_df_floor)).cast("long"),
                 F.floor(F.count(F.lit(1)) * F.lit(float(max_df_frac)))
             ).alias("__cap")))
    kept = kept.crossJoin(F.broadcast(cap)) \
               .where(F.col("__df") <= F.col("__cap")).drop("__cap")

    npart = max(spark.sparkContext.defaultParallelism,
                int(spark.conf.get("spark.sql.shuffle.partitions")))
    lists = (kept.groupBy("__g")
                 .agg(F.sort_array(F.collect_list(F.col(id_col)))
                      .alias("__ids"))
                 .repartition(npart, "__g"))
    wl = (lists.where(F.size("__ids") >= 2)
               .groupBy("__ids").agg(F.count(F.lit(1)).alias("__w")))

    # ---- statistics ----
    t0 = time.monotonic()
    stats = {}
    stats["docs"] = docs.count()
    stats["nonnull"] = docs.where(F.col(text_col).isNotNull()).count()
    stats["uniq_texts"] = uniq.count()
    r = (kept.groupBy(id_col).count()
             .agg(F.count("*").alias("docs_with_kept"),
                  F.sum("count").alias("kept_rows"),
                  F.min("count").alias("min_n"),
                  F.expr("percentile(count, 0.5)").alias("med_n"),
                  F.max("count").alias("max_n")).collect()[0])
    stats.update(r.asDict())
    lr = (lists.select(F.size("__ids").alias("s"))
               .agg(F.count("*").alias("vocab_kept"),
                    F.sum("s").alias("post_rows"),
                    F.sum(F.col("s") * (F.col("s") - 1) / 2).alias("pairs_full"),
                    F.max("s").alias("max_df")).collect()[0])
    stats.update(lr.asDict())
    wr = (wl.agg(F.count("*").alias("wl_lists"),
                 F.sum(F.size("__ids") * (F.size("__ids") - 1) / 2)
                  .alias("pairs_collapsed")).collect()[0])
    stats.update(wr.asDict())
    stats["stats_sec"] = round(time.monotonic() - t0, 2)
    print(stats, flush=True)

    # ---- sub-stage timings (noop, warm best-of-2) ----
    for label, frame in [("lists", lists), ("wl", wl)]:
        frame.write.format("noop").mode("overwrite").save()
        best = min(noop_time(frame, label, spark) for _ in range(2))
        print(f"{label:12s} {best:7.2f}s", flush=True)

    # full query
    import __spark_entry__ as m
    q = m.queries()["containment"]
    d = q(spark, sf)
    d.write.format("noop").mode("overwrite").save()
    best = min(noop_time(d, "containment_full", spark) for _ in range(2))
    print(f"{'full':12s} {best:7.2f}s", flush=True)

    # shared-aggregate alone (pair expansion + count) — the suspected mass
    pe = wl.select(F.posexplode("__ids").alias("__i", "id_a"),
                   F.col("__ids"), F.col("__w"))
    anchors = (pe.select(
                   "id_a", "__w",
                   F.slice(F.col("__ids"), F.col("__i") + 2,
                           F.greatest(F.size("__ids") - F.col("__i") - 1,
                                      F.lit(0))).alias("__ptn"))
                 .where(F.size("__ptn") >= 1))
    shared = (anchors.repartition(npart, "id_a")
                     .select("id_a", F.explode("__ptn").alias("id_b"),
                             "__w")
                     .groupBy("id_a", "id_b")
                     .agg(F.sum("__w").alias("__c")))
    shared.write.format("noop").mode("overwrite").save()
    best = min(noop_time(shared, "shared", spark) for _ in range(2))
    print(f"{'shared':12s} {best:7.2f}s", flush=True)
    print("shared_pairs", shared.count(), flush=True)


if __name__ == "__main__":
    main()
