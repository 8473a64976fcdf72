"""Paired A/B: containment's tail (shared -> rp -> both -> rep_pairs)
vs a variant that filters pairs on c/least(sa,sb) >= t BEFORE the
two-directions Generate (identical output: c/min is the max of the two
directed ratios, and double division is monotone non-increasing in a
positive divisor, so the pre-filter keeps exactly the pairs with at
least one surviving direction).
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
    sizes = (lists.select(F.explode("__ids").alias(id_col))
                  .groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz")))
    wl = (lists.where(F.size("__ids") >= 2)
               .groupBy("__ids").agg(F.count(F.lit(1)).alias("__w")))
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
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("__sz").alias("__sa"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__sb"))
    rp = shared.join(sa, on="id_a").join(sb, on="id_b")

    def both_of(src):
        return src.select(F.explode(F.array(
            F.struct(F.col("id_a").alias("a"), F.col("id_b").alias("b"),
                     (F.col("__c") / F.col("__sa")).alias("ct")),
            F.struct(F.col("id_b").alias("a"), F.col("id_a").alias("b"),
                     (F.col("__c") / F.col("__sb")).alias("ct"))))
            .alias("__p")) \
            .select(F.col("__p.a").alias("id_a"), F.col("__p.b").alias("id_b"),
                    F.col("__p.ct").alias("__ct")) \
            .where(F.col("__ct") >= F.lit(threshold))

    rep_old = both_of(rp)
    rp_f = rp.where((F.col("__c") / F.least("__sa", "__sb"))
                    >= F.lit(threshold))
    rep_new = both_of(rp_f)

    def best_noop(frame, label):
        spark.sparkContext.setJobDescription(label)
        t = time.monotonic()
        frame.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t

    # warm both
    for f in (wl, shared, rep_old, rep_new):
        f.write.format("noop").mode("overwrite").save()
    for rnd in range(3):
        t_wl = best_noop(wl, "wl")
        t_sh = best_noop(shared, "shared")
        t_old = best_noop(rep_old, "rep_old")
        t_new = best_noop(rep_new, "rep_new")
        print(f"round {rnd}: wl={t_wl:.2f} shared={t_sh:.2f} "
              f"rep_old={t_old:.2f} rep_new={t_new:.2f}", flush=True)
    a = rep_old.select("id_a", "id_b", "__ct")
    b = rep_new.select("id_a", "id_b", "__ct")
    print("parity only_old=", a.exceptAll(b).count(),
          "only_new=", b.exceptAll(a).count(),
          "rows=", a.count(), flush=True)


if __name__ == "__main__":
    main()
