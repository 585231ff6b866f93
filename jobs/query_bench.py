"""spark-submit entry point: query-latency benchmark over a built index.

Runs the reference-style query mix (rare/mid/heavy single terms + 2-term
+ 3-term) through the block-max WAND path, reports p50/p95 per mode.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics as stats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from search_engine_skillbox_spark.operators.index_store import IndexStore
    from search_engine_skillbox_spark.operators.wand import wand_topk

    spark = SparkSession.builder.appName("query_bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # IndexStore recovers n_buckets / salt_threshold from meta.json itself
    store = IndexStore(args.index)

    terms = (store.terms(spark).orderBy(F.desc("df")).limit(5000).collect())
    by_df = sorted(terms, key=lambda r: r["df"])
    rare, mid, heavy = (by_df[0]["term"], by_df[len(by_df) // 2]["term"],
                        by_df[-1]["term"])
    qset = [[mid], [rare], [heavy], [mid, rare], [heavy, mid, rare]]

    out = {}
    for mode in ("compat", "bm25"):
        wand_topk(spark, store, [mid], args.k, mode).collect()  # warm
        lat, cold, warm = [], [], []
        for rep in range(args.reps):
            for q in qset:
                t0 = time.time()
                wand_topk(spark, store, q, args.k, mode).collect()
                dt = time.time() - t0
                lat.append(dt)
                # first run of each distinct query is the cold sample
                (cold if rep == 0 else warm).append(dt)
        lat.sort()
        # overall percentiles (cold first-runs INCLUDED — comparable
        # with earlier rounds), plus the cold/warm split: cold = each
        # distinct query's first execution in the session (codegen
        # compile + first-touch parquet listing), warm = steady state
        out[f"{mode}_p50_sec"] = round(stats.median(lat), 4)
        out[f"{mode}_p95_sec"] = round(lat[max(0, int(len(lat) * 0.95) - 1)], 4)
        out[f"{mode}_mean_sec"] = round(sum(lat) / len(lat), 4)
        out[f"{mode}_cold_max_sec"] = round(max(cold), 4)
        if warm:
            warm.sort()
            out[f"{mode}_warm_p95_sec"] = round(
                warm[max(0, int(len(warm) * 0.95) - 1)], 4)
    out["n_queries"] = args.reps * len(qset) * 2
    print(json.dumps(out))


if __name__ == "__main__":
    main()
