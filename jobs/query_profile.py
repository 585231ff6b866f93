"""spark-submit entry point: per-query job-count + latency profile over
a built index — the diagnostic twin of query_bench (which reports only
aggregate percentiles). For each query in the reference mix it reports
cold (first-touch: dictionary + histogram memoization misses) and warm
latency plus the number of Spark jobs each run scheduled, so scheduling
overhead is separable from decode volume."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--warm-reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from search_engine_skillbox_spark.operators.index_store import IndexStore
    from search_engine_skillbox_spark.operators.wand import wand_topk

    spark = SparkSession.builder.appName("query_profile").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    store = IndexStore(args.index)

    terms = store.terms(spark).orderBy(F.desc("df")).limit(5000).collect()
    by_df = sorted(terms, key=lambda r: r["df"])
    rare, mid, heavy = (by_df[0]["term"], by_df[len(by_df) // 2]["term"],
                        by_df[-1]["term"])
    qset = {"mid": [mid], "rare": [rare], "heavy": [heavy],
            "mid+rare": [mid, rare], "all3": [heavy, mid, rare]}

    def timed(name: str, q: list[str], mode: str) -> dict:
        group = f"{name}-{mode}-{time.time()}"
        sc.setJobGroup(group, name)
        dbg: dict = {}
        t0 = time.time()
        wand_topk(spark, store, q, args.k, mode, debug=dbg).collect()
        dt = time.time() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup("", "")
        return {"sec": round(dt, 3), "jobs": jobs, "phases": dbg}

    out = {"terms": {"rare": rare, "mid": mid, "heavy": heavy},
           "df": {r["term"]: r["df"] for r in (by_df[0], by_df[len(by_df) // 2],
                                               by_df[-1])}}
    for mode in ("compat", "bm25"):
        res = {}
        for name, q in qset.items():
            cold = timed(name, q, mode)
            warms = [timed(name, q, mode) for _ in range(args.warm_reps)]
            res[name] = {"cold": cold,
                         "warm_sec": [w["sec"] for w in warms],
                         "warm_jobs": warms[0]["jobs"]}
        out[mode] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
