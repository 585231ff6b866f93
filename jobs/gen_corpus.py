"""spark-submit entry point: write the deterministic synthetic pages
corpus to parquet. Exists so scaling runs can generate the corpus in a
SUBPROCESS — the generator JVM exits before any timed build starts,
instead of idling in the harness process through the measurements."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--partitions", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from search_engine_skillbox_spark.sources.corpus import pages_df

    spark = SparkSession.builder.appName("gen_corpus").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    parts = args.partitions or max(128, args.docs // 8000)
    pages_df(spark, args.docs, args.seed,
             partitions=parts).write.parquet(args.output)
    print(json.dumps({"docs": args.docs, "output": args.output,
                      "partitions": parts}))


if __name__ == "__main__":
    main()
