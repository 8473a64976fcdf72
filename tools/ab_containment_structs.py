"""Paired A/B: containment with per-doc kept-set sizes carried INSIDE
the posting-list structs (pair aggregate keys (id_a, sa, id_b, sb) —
functionally dependent, so groups are identical) vs the current shape
whose sizes attach via two SortMergeJoins that sort the 10.3M-row pair
table twice and re-shuffle it once (plan nodes 96-103).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F, Window
from spork_spark import get_spark
from spork_spark.operators.dedup import (
    _exact_text_groups, _group_members, _shingle_instances, _spread,
    _within_group_pairs, containment_pairs)


def build_new(docs, id_col, text_col, n, threshold, max_df_frac,
              max_df_floor, spark):
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
    # NEW: per-doc kept-set size via a second (id-keyed) window, serial
    # in the chain — no new plan branch, so nothing re-executes.
    kept = kept.withColumn(
        "__sz", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    npart = max(spark.sparkContext.defaultParallelism,
                int(spark.conf.get("spark.sql.shuffle.partitions")))
    lists = (kept.groupBy("__g")
                 .agg(F.sort_array(F.collect_list(
                     F.struct(F.col(id_col).alias("__id"),
                              F.col("__sz")))).alias("__ids"))
                 .repartition(npart, "__g"))
    sizes = (lists.select(F.explode("__ids").alias("__e"))
                  .select(F.col("__e.__id").alias(id_col),
                          F.col("__e.__sz").alias("__sz"))
                  .dropDuplicates([id_col]))
    wl = (lists.where(F.size("__ids") >= 2)
               .groupBy("__ids").agg(F.count(F.lit(1)).alias("__w")))
    pe = wl.select(F.posexplode("__ids").alias("__i", "__a"),
                   F.col("__ids"), F.col("__w"))
    anchors = (pe.select(
                   F.col("__a"), "__w",
                   F.slice(F.col("__ids"), F.col("__i") + 2,
                           F.greatest(F.size("__ids") - F.col("__i") - 1,
                                      F.lit(0))).alias("__ptn"))
                 .where(F.size("__ptn") >= 1))
    shared = (anchors.repartition(npart, F.col("__a.__id"))
                     .select(F.col("__a.__id").alias("id_a"),
                             F.col("__a.__sz").alias("__sa"),
                             F.explode("__ptn").alias("__b"), "__w")
                     .select("id_a", "__sa",
                             F.col("__b.__id").alias("id_b"),
                             F.col("__b.__sz").alias("__sb"), "__w")
                     .groupBy("id_a", "__sa", "id_b", "__sb")
                     .agg(F.sum("__w").alias("__c")))
    both = shared.select(F.explode(F.array(
        F.struct(F.col("id_a").alias("a"), F.col("id_b").alias("b"),
                 (F.col("__c") / F.col("__sa")).alias("ct")),
        F.struct(F.col("id_b").alias("a"), F.col("id_a").alias("b"),
                 (F.col("__c") / F.col("__sb")).alias("ct"))))
        .alias("__p"))
    rep_pairs = (both.select(F.col("__p.a").alias("id_a"),
                             F.col("__p.b").alias("id_b"),
                             F.col("__p.ct").alias("__ct"))
                     .where(F.col("__ct") >= F.lit(threshold)))
    gm = _group_members(members, id_col)
    ga = gm.select(F.col("__gid").alias("id_a"), F.col("__ids").alias("__ias"))
    gb = gm.select(F.col("__gid").alias("id_b"), F.col("__ids").alias("__ibs"))
    cross = (rep_pairs.join(ga, on="id_a").join(gb, on="id_b")
             .select(F.explode("__ias").alias("__ia"), "__ibs", "__ct")
             .select(F.col("__ia").alias("id_a"),
                     F.explode("__ibs").alias("id_b"), "__ct"))
    within = (_within_group_pairs(members, id_col)
              .join(sizes.select(F.col(id_col).alias("__gid")), on="__gid")
              .select("id_a", "id_b"))
    within = (within.unionByName(
                  within.select(F.col("id_b").alias("id_a"),
                                F.col("id_a").alias("id_b")))
              .select("id_a", "id_b", F.lit(1.0).alias("__ct"))
              .where(F.lit(1.0) >= F.lit(threshold)))
    return (cross.unionByName(within)
            .select("id_a", "id_b", F.round("__ct", 4).alias("containment")))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[32]",
                      extra_conf={**bench.LATENCY_PROFILE,
                                  "spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    new = build_new(docs, "doc_id", "text", 8, 0.6, 0.1, 50, spark)
    old = containment_pairs(docs, "doc_id", "text", n=8, threshold=0.6,
                            max_df_frac=0.1, max_df_floor=50)

    def noop(frame, label):
        spark.sparkContext.setJobDescription(label)
        t = time.monotonic()
        frame.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t

    for f, l in ((new, "warm_new"), (old, "warm_old")):
        noop(f, l)
    for rnd in range(4):
        t_new = noop(new, "cont_structs")
        t_old = noop(old, "cont_current")
        print(f"round {rnd}: new={t_new:.2f}s old={t_old:.2f}s", flush=True)
    a = old.select("id_a", "id_b", "containment")
    b = new.select("id_a", "id_b", "containment")
    print("parity only_old=", a.exceptAll(b).count(),
          "only_new=", b.exceptAll(a).count(), "rows=", a.count(),
          flush=True)


if __name__ == "__main__":
    main()
