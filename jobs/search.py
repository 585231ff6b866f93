"""spark-submit entry point: query a built index.

    spark-submit --py-files engine.zip jobs/search.py \
        --index /path/to/index --query "слово word" [--offset 0 --limit 10]

Prints the API-shaped JSON response (SearchResponse, SURVEY §3.1 step 9).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default="")
    ap.add_argument("--offset", type=int, default=0)
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--mode", choices=["compat", "bm25"], default="compat")
    ap.add_argument("--site", default=None,
                    help="host filter (the reference's site= query param)")
    ap.add_argument("--statistics", action="store_true",
                    help="print /api/statistics instead of searching")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from search_engine_skillbox_spark.operators.index_store import IndexStore
    from search_engine_skillbox_spark.operators.service import (
        search_service, statistics_service)

    spark = SparkSession.builder.appName("search").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # IndexStore recovers n_buckets / salt_threshold from meta.json itself
    store = IndexStore(args.index)

    if args.statistics:
        print(json.dumps(statistics_service(spark, store), ensure_ascii=False))
    else:
        print(json.dumps(
            search_service(spark, store, args.query,
                           offset=args.offset, limit=args.limit,
                           mode=args.mode, site=args.site),
            ensure_ascii=False))


if __name__ == "__main__":
    main()
