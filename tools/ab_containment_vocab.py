"""Paired A/B: containment with the vocabulary built by ONE
shingle-keyed aggregate (collect_set of (id, gn) structs; weighted df
via a HOF sum over the vocabulary-sized rows) versus the current
dropDuplicates -> gsz join -> df window -> lists groupBy chain (three
instance-scale shuffles, mostly at shuffle.partitions=8 under the
bench profile). __gn rides along from a pre-explode join of the
group-size table against the distinct texts (replacing the reps join
inside _exact_text_groups' uniq), so no instance-scale join remains.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F
from spork_spark import get_spark
from spork_spark.operators.dedup import (
    _group_members, _spread, _within_group_pairs, containment_pairs)


def build_new(docs, id_col, text_col, n, threshold, max_df_frac,
              max_df_floor, spark):
    df = _spread(docs.select(id_col, text_col))
    nn = df.where(F.col(text_col).isNotNull())
    tkey = [F.md5(F.col(text_col)).alias("__tk"),
            F.length(text_col).alias("__tl")]
    mem0 = nn.select(F.col(id_col), *tkey)
    groups = mem0.groupBy("__tk", "__tl").agg(
        F.min(id_col).alias("__gid"),
        F.count(F.lit(1)).alias("__gn"))
    members = (mem0.join(groups, on=["__tk", "__tl"])
                   .select(id_col, "__gid", "__gn"))
    gsz = members.where(F.col(id_col) == F.col("__gid")) \
                 .select(F.col(id_col), F.col("__gn"))
    # one row per distinct text, group size attached BEFORE the explode
    uniq_gn = nn.select(F.col(id_col), F.col(text_col)).join(gsz, on=id_col)
    c = F.col(text_col)
    inst = (uniq_gn
            .select(F.col(id_col),
                    F.explode(F.sequence(
                        F.lit(1),
                        F.greatest(F.length(c) - (n - 1), F.lit(1))))
                     .alias("__i"),
                    c.alias("__t"), F.col("__gn"))
            .select(F.col(id_col),
                    F.expr(f"substring(__t, __i, {int(n)})").alias("__g"),
                    F.col("__gn")))
    npart = max(spark.sparkContext.defaultParallelism,
                int(spark.conf.get("spark.sql.shuffle.partitions")))
    vocab = (inst.repartition(npart, "__g")
                 .groupBy("__g")
                 .agg(F.collect_set(
                     F.struct(F.col(id_col).alias("__id"),
                              F.col("__gn"))).alias("__set")))
    dfw = F.aggregate("__set", F.lit(0).cast("long"),
                      lambda acc, x: acc + x["__gn"])
    cap = (df.where(F.col(text_col).isNotNull())
             .agg(F.greatest(
                 F.lit(int(max_df_floor)).cast("long"),
                 F.floor(F.count(F.lit(1)) * F.lit(float(max_df_frac)))
             ).alias("__cap")))
    keptv = (vocab.withColumn("__df", dfw)
                  .crossJoin(F.broadcast(cap))
                  .where(F.col("__df") <= F.col("__cap")))
    lists = (keptv.select(
                 "__g",
                 F.sort_array(F.transform("__set", lambda x: x["__id"]))
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
    both = rp.select(F.explode(F.array(
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
        t_new = noop(new, "cont_vocab1agg")
        t_old = noop(old, "cont_current")
        print(f"round {rnd}: new={t_new:.2f}s old={t_old:.2f}s", flush=True)
    a = old.select("id_a", "id_b", "containment")
    b = new.select("id_a", "id_b", "containment")
    print("parity only_old=", a.exceptAll(b).count(),
          "only_new=", b.exceptAll(a).count(), "rows=", a.count(),
          flush=True)


if __name__ == "__main__":
    main()
