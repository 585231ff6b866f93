"""Round-8 profiling harness (guide §1): decompose bench.py's two build
phases into lineage-phase durations + explicit sub-timers, without
touching the frozen bench.py. Prints one JSON object.

Usage: python bench_extra.py [sf_dir] > profile.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_DOCS = int(os.environ.get("BENCH_SYNTH_DOCS", "20000"))


def lineage_phases(path: str) -> dict:
    out = {}
    with open(os.path.join(path, "lineage.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r["status"] == "DONE":
                out[r["partition_id"]] = round(
                    r["finished_at"] - r["started_at"], 3)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from search_engine_skillbox_spark.operators.index_store import IndexStore
    from search_engine_skillbox_spark.session import get_spark
    from search_engine_skillbox_spark.sources.corpus import pages_df
    from search_engine_skillbox_spark.sources.pages import prepare_pages

    spark = get_spark("bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    sc = spark.sparkContext
    tmp = tempfile.mkdtemp(prefix="bench_extra_")
    prof: dict = {"sf_dir": SF_DIR, "cpus": CPUS}

    def timed(d: dict, name: str, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        r = fn()
        d[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        return r

    # ---- phase 1: sf build, decomposed --------------------------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    raw = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".test/doc/"),
                 F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"), F.col("lang"))
    raw.count()

    d1: dict = {}
    t_all = time.time()
    prepared = prepare_pages(raw).persist()
    # isolate the prepare_pages materialization (bench.py folds it into
    # the first job of build) with a noop sink (guide §1.4)
    timed(d1, "prepare_pages_noop",
          lambda: prepared.write.format("noop").mode("overwrite").save())
    store_sf = IndexStore(os.path.join(tmp, "sf"), n_buckets=16,
                          salt_threshold=100_000)
    timed(d1, "store_build",
          lambda: store_sf.build(spark, prepared, checkpoint_groups=1))
    d1["total"] = round(time.time() - t_all, 3)
    d1["lineage"] = lineage_phases(os.path.join(tmp, "sf"))
    prepared.unpersist()
    prof["sf_build"] = d1

    # ---- phase 2: synth build, decomposed -----------------------------
    corpus_path = os.path.join(tmp, "corpus")
    pages_df(spark, SYNTH_DOCS, 42,
             partitions=CPUS * 2).write.parquet(corpus_path)
    raw_big = spark.read.parquet(corpus_path)
    raw_big.count()

    d2: dict = {}
    t_all = time.time()
    prep_big = prepare_pages(raw_big).persist()
    timed(d2, "prepare_pages_noop",
          lambda: prep_big.write.format("noop").mode("overwrite").save())
    store_big = IndexStore(os.path.join(tmp, "big"), n_buckets=32,
                          salt_threshold=50_000)
    timed(d2, "store_build",
          lambda: store_big.build(spark, prep_big, checkpoint_groups=4))
    d2["total"] = round(time.time() - t_all, 3)
    d2["lineage"] = lineage_phases(os.path.join(tmp, "big"))
    prep_big.unpersist()
    prof["synth_build"] = d2

    print(json.dumps(prof, indent=1))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
