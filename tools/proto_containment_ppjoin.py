"""Prototype: PPJoin-style prefix-filtered candidate generation +
exact-intersection verify for containment_pairs, measured against the
current weighted-list expansion (guide §3.3/§2.3; VERDICT r10 item 1).

Soundness of the one-sided prefix scheme for the DIRECTED threshold:
a pair (x, y) with nx <= ny emits at least one output direction iff
c = |X∩Y| >= ceil(t*nx) (c/nx is the larger ratio). If so, any
nx - ceil(t*nx) + 1 tokens of X contain a common token, so X's PREFIX
(that many rarest-first tokens) shares a token with Y: bucket meetings
of (prefix-entry anchor, any later entry in (n, id) order) form a
complete candidate generator. Positional filter: for the globally
smallest common token g* the meeting has no common token before it on
either side (arrays share one total order), so c <= 1 + min(nx-pa,
ny-pb) at that meeting; filtering each meeting with its own bound
keeps the g* meeting of every true pair.

Usage: python tools/proto_containment_ppjoin.py /root/testdata/sf0.1 [--parity]
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


def build_ppjoin(docs, id_col, text_col, n, threshold, max_df_frac,
                 max_df_floor, spark):
    ppm = int(round(threshold * 1_000_000))
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
    # ONE token-keyed aggregate: posting list + surrogate key packed from
    # (unweighted df class, rank within class) — injective, rarity order.
    agg = (kept.groupBy("__g")
               .agg(F.collect_set(F.col(id_col)).alias("__docs"))
               .repartition(npart, "__g"))
    rank_w = Window.partitionBy("__dfc").orderBy("__g")
    keyed = (agg.select(F.size("__docs").cast("long").alias("__dfc"),
                        F.col("__g"), F.col("__docs"))
                .select((F.shiftleft(F.col("__dfc"), 32)
                         + F.row_number().over(rank_w)).alias("__t"),
                        F.col("__docs")))
    posts = keyed.select("__t", F.explode("__docs").alias(id_col))
    ranked = (posts.groupBy(id_col)
                   .agg(F.array_sort(F.collect_list("__t")).alias("__arr"))
                   .repartition(npart, id_col))
    base = ranked.select(F.col(id_col), F.col("__arr"),
                         F.size("__arr").alias("__n"))
    sizes = base.select(id_col, F.col("__n").cast("long").alias("__sz"))

    # bucket entries with positions; anchors restricted to prefixes
    prows = base.select(id_col, "__n",
                        F.posexplode("__arr").alias("__p", "__t"))
    buckets = (prows.groupBy("__t")
                    .agg(F.sort_array(F.collect_list(
                        F.struct("__n", F.col(id_col).alias("__id"),
                                 "__p"))).alias("__ps"))
                    .where(F.size("__ps") >= 2))
    pe = buckets.select(F.posexplode("__ps").alias("__i", "__a"),
                        F.col("__ps"))
    # prefix length: n - ceil(t*n) + 1  (exact integer ppm arithmetic)
    an = F.col("__a.__n")
    a_alpha = ((F.lit(ppm) * an + F.lit(999_999)) / F.lit(1_000_000)) \
        .cast("long")
    pre = pe.where(F.col("__a.__p") + 1 <= an - a_alpha + 1)
    mpairs = pre.select(
        F.col("__a"), a_alpha.alias("__al"),
        F.explode(F.slice(F.col("__ps"), F.col("__i") + 2,
                          F.greatest(F.size("__ps") - F.col("__i") - 1,
                                     F.lit(0)))).alias("__b"))
    ub = 1 + F.least(F.col("__a.__n") - F.col("__a.__p") - 1,
                     F.col("__b.__n") - F.col("__b.__p") - 1)
    cand = (mpairs.where(ub >= F.col("__al"))
                  .select(F.col("__a.__id").alias("id_a"),
                          F.col("__b.__id").alias("id_b"))
                  .dropDuplicates(["id_a", "id_b"]))

    sets = base.select(id_col, "__arr")
    ver = (cand
           .join(sets.select(F.col(id_col).alias("id_a"),
                             F.col("__arr").alias("__aa")), on="id_a")
           .join(sets.select(F.col(id_col).alias("id_b"),
                             F.col("__arr").alias("__ab")), on="id_b")
           .select("id_a", "id_b",
                   F.size(F.array_intersect("__aa", "__ab")).alias("__c"),
                   F.size("__aa").alias("__sa"),
                   F.size("__ab").alias("__sb"))
           .where((F.col("__c") / F.least("__sa", "__sb"))
                  >= F.lit(threshold)))
    both = ver.select(F.explode(F.array(
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
    out = (cross.unionByName(within)
           .select("id_a", "id_b", F.round("__ct", 4).alias("containment")))
    return out, cand, mpairs, pre


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    parity = "--parity" in sys.argv
    spark = get_spark(master="local[32]",
                      extra_conf={**bench.LATENCY_PROFILE,
                                  "spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    args = ("doc_id", "text", 8, 0.6, 0.1, 50)

    new, cand, mpairs, pre = build_ppjoin(docs, *args, spark)

    t0 = time.monotonic()
    n_pre = pre.count()
    n_meet = mpairs.count()
    n_cand = cand.count()
    print(f"prefix anchors={n_pre} meetings={n_meet} candidates={n_cand} "
          f"(count {time.monotonic()-t0:.1f}s)", flush=True)

    def best_noop(frame, label, k=3):
        spark.sparkContext.setJobDescription(label)
        frame.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(k):
            t = time.monotonic()
            frame.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t)
        return best

    old = containment_pairs(docs, "doc_id", "text", n=8, threshold=0.6,
                            max_df_frac=0.1, max_df_floor=50)
    # paired, alternating A/B
    for rnd in range(3):
        t_new = best_noop(new, "containment_ppjoin", 1)
        t_old = best_noop(old, "containment_current", 1)
        print(f"round {rnd}: new={t_new:.2f}s old={t_old:.2f}s", flush=True)

    if parity:
        a = old.select("id_a", "id_b", "containment")
        b = new.select("id_a", "id_b", "containment")
        only_old = a.exceptAll(b).count()
        only_new = b.exceptAll(a).count()
        print(f"parity: only_old={only_old} only_new={only_new} "
              f"rows_old={a.count()} rows_new={b.count()}", flush=True)


if __name__ == "__main__":
    main()
