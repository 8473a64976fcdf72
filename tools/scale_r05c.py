"""Round-5 late-session scale evidence: sf0.1 -> sf1 slopes for the
operators added after SCALE_r05.json was recorded (incremental LSH,
gap_fill/group_ols/rolling_sum/ewma, equifreq_bins, bigram_lm,
embedding_covariance, pareto_frontier, hard_negatives, benford).

Each op runs cold once then warm x3 (median reported) at sf0.1 and sf1
(tools/make_scale.py layouts); slope = warm_sf1 / warm_sf0.1 on 10x
data. Appends a "late_session_ops" section to SCALE_r05.json.

Usage: python tools/scale_r05c.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/repo/testdata_sf01multi"
SF1 = "/root/repo/testdata_sf1"


def timed(fn):
    fn()                                     # cold / warm-up
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 4)


def main():
    from pyspark.sql import functions as F

    from spork_spark import get_spark
    from spork_spark.operators import (benford_digits, bigram_lm_score,
                                       embedding_covariance, equifreq_bins,
                                       ewma, gap_fill, group_ols,
                                       hard_negatives, lsh_pairs_incremental,
                                       minhash_banding, pareto_frontier,
                                       rolling_sum)
    from spork_spark.session import _input_bytes, autosize_conf

    out = {}
    for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
        spark = get_spark(master="local[32]",
                          extra_conf=autosize_conf(_input_bytes(sf)))
        spark.sparkContext.setLogLevel("ERROR")
        ev = spark.read.parquet(f"{sf}/events.parquet")
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        part = spark.read.parquet(f"{sf}/part.parquet")
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        purch = (ev.filter(F.col("event_type") == "purchase")
                   .withColumn("k", F.pmod(F.col("user_id"), F.lit(50))))
        old = docs.filter(F.col("doc_id") % 5 != 0)
        new = docs.filter(F.col("doc_id") % 5 == 0)
        anchors = emb.filter(F.col("vec_id") % 50 == 0)

        def sink(df):
            df.write.format("noop").mode("overwrite").save()

        ops = {
            "gap_fill": lambda: sink(gap_fill(purch, "k", "ts", "value")),
            "group_ols": lambda: sink(group_ols(ev, "event_type", "ts",
                                                "value")),
            "rolling_sum": lambda: sink(rolling_sum(ev, "event_type",
                                                    "ts", "value")),
            "ewma": lambda: sink(ewma(ev, "event_type", "ts", "value")),
            "equifreq_bins": lambda: sink(equifreq_bins(ev, "value", 10)),
            "benford": lambda: sink(benford_digits(li, "l_extendedprice")),
            "bigram_lm": lambda: sink(bigram_lm_score(docs)),
            "embedding_covariance": lambda: sink(
                embedding_covariance(emb, "embedding", dim=64)),
            "pareto_part": lambda: sink(pareto_frontier(
                part, {"p_size": "max", "p_retailprice": "min"})),
            "hard_negatives": lambda: sink(hard_negatives(
                emb, anchors=anchors, k=5)),
            "dedup_incremental": lambda: sink(lsh_pairs_incremental(
                minhash_banding(old, "doc_id", "text"), old, new,
                "doc_id", "text", threshold=0.6)),
        }
        res = {}
        for name, fn in ops.items():
            res[name] = timed(fn)
            print(f"{label} {name}: {res[name]}s", flush=True)
        out[label] = res
        spark.stop()

    slopes = {k: (round(out["sf1"][k] / out["sf0.1"][k], 2)
                  if out["sf0.1"][k] > 0 else None)
              for k in out["sf0.1"]}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_r05.json")
    doc = json.load(open(path))
    doc["late_session_ops"] = {
        "protocol": "cold + median-of-3 warm through noop sink, "
                    "autosized confs, multi-file layouts",
        "sf0.1": out["sf0.1"], "sf1": out["sf1"],
        "slope_10x_data": slopes}
    json.dump(doc, open(path, "w"), indent=1)
    print(json.dumps(slopes, indent=1))


if __name__ == "__main__":
    main()
