"""Per-round benchmark (driver contract): headline engine queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Covers the engine's two headline paths from BASELINE.json:
  * index-build throughput (docs/sec) over the sf documents corpus AND
    over a larger deterministic synthetic pages corpus (generation
    excluded — corpus parquet is written untimed, build reads it)
  * top-k query latency (p50/p95 over the reference-style query set,
    compat + bm25, block-max WAND path)

Scaling-efficiency evidence (N→4N, north rule) lives in
bench/scaling.py → BENCH/BASELINE.md (two spark-submit runs; too heavy
to repeat every round).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics as stats
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_DOCS = int(os.environ.get("BENCH_SYNTH_DOCS", "20000"))
QUERY_REPS = int(os.environ.get("BENCH_QUERY_REPS", "5"))


def main() -> None:
    from pyspark.sql import functions as F

    from search_engine_skillbox_spark.operators import build as B
    from search_engine_skillbox_spark.operators.index_store import IndexStore
    from search_engine_skillbox_spark.operators.service import search_service
    from search_engine_skillbox_spark.operators.wand import wand_topk
    from search_engine_skillbox_spark.session import get_spark
    from search_engine_skillbox_spark.sources.corpus import pages_df
    from search_engine_skillbox_spark.sources.pages import prepare_pages

    spark = get_spark("bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    tmp = tempfile.mkdtemp(prefix="bench_idx_")
    timings: dict[str, float] = {}
    extra: dict = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t = time.time()
            def __exit__(self, *a):
                timings[name] = round(time.time() - self.t, 3)
        return _T()

    # ---- 1. sf documents table as the pages corpus
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    raw = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".test/doc/"),
                 F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"), F.col("lang"))
    n_sf_docs = docs.count()

    with timed("build_index_sf"):
        prepared = prepare_pages(raw).persist()
        store_sf = IndexStore(os.path.join(tmp, "sf"), n_buckets=16,
                              salt_threshold=100_000)
        store_sf.build(spark, prepared, checkpoint_groups=1)
    extra["sf_docs_per_sec"] = round(n_sf_docs / timings["build_index_sf"], 1)

    # ---- 2. large synthetic corpus: untimed generation, timed build
    corpus_path = os.path.join(tmp, "corpus")
    pages_df(spark, SYNTH_DOCS, 42, partitions=CPUS * 2).write.parquet(corpus_path)
    raw_big = spark.read.parquet(corpus_path)
    with timed("build_index_synth"):
        prep_big = prepare_pages(raw_big).persist()
        store_big = IndexStore(os.path.join(tmp, "big"), n_buckets=32,
                               salt_threshold=50_000)
        store_big.build(spark, prep_big, checkpoint_groups=4)
    extra["synth_docs"] = SYNTH_DOCS
    extra["synth_docs_per_sec"] = round(SYNTH_DOCS / timings["build_index_synth"], 1)

    # ---- 3. query latency over the big store (reference-style query set)
    terms = (store_big.terms(spark)
             .orderBy(F.desc("df")).limit(2000).collect())
    by_df = sorted(terms, key=lambda r: r["df"])
    heavy = by_df[-1]["term"]
    mid = by_df[len(by_df) // 2]["term"]
    rare = by_df[0]["term"]
    qset = [[mid], [rare], [heavy], [mid, rare], [heavy, mid, rare]]

    for mode in ("compat", "bm25"):
        lat = []
        wand_topk(spark, store_big, [mid], 10, mode).collect()  # warm-up
        for _ in range(QUERY_REPS):
            for q in qset:
                t0 = time.time()
                wand_topk(spark, store_big, q, 10, mode).collect()
                lat.append(time.time() - t0)
        lat.sort()
        timings[f"query_{mode}_p50"] = round(stats.median(lat), 3)
        timings[f"query_{mode}_p95"] = round(lat[int(len(lat) * 0.95) - 1], 3)

    # ---- 3b. per-query Spark job counts (VERDICT r3 #7: track the
    # serving tier's zero-job claim round-over-round) + site-filtered
    # path latency (T9 — the round-3 scale-killer fix)
    from search_engine_skillbox_spark.operators.wand import site_topk
    sc = spark.sparkContext

    def count_jobs(fn) -> int:
        gid = f"bench-jobs-{time.time_ns()}"
        sc.setJobGroup(gid, "bench job count")
        fn()
        sc.setLocalProperty("spark.jobGroup.id", None)
        return len(sc.statusTracker().getJobIdsForGroup(gid))

    q3 = [heavy, mid, rare]
    extra["query_jobs_serving"] = count_jobs(
        lambda: wand_topk(spark, store_big, q3, 10).collect())
    extra["query_jobs_distributed"] = count_jobs(
        lambda: wand_topk(spark, store_big, q3, 10,
                          serving=False).collect())
    host = "alpha.test"
    site_topk(spark, store_big, q3, 10, host).collect()  # warm-up
    slat = []
    for _ in range(QUERY_REPS):
        t0 = time.time()
        site_topk(spark, store_big, q3, 10, host).collect()
        slat.append(time.time() - t0)
    slat.sort()
    timings["query_site_p50"] = round(stats.median(slat), 3)
    extra["site_query_jobs"] = count_jobs(
        lambda: site_topk(spark, store_big, q3, 10, host).collect())

    # ---- 4. full service e2e (hydrate + snippets). Round 5: the whole
    # tombstone-free request (top-k + count + hydrate + presentation)
    # is served driver-side — service_jobs should be 0.
    with timed("search_service_e2e"):
        search_service(spark, store_big, f"{mid} {rare}", limit=10)
    extra["service_jobs"] = count_jobs(
        lambda: search_service(spark, store_big, f"{mid} {rare}",
                               limit=10))

    total = round(sum(v for k, v in timings.items()
                      if not k.startswith("query_")) +
                  timings["query_compat_p50"] + timings["query_bm25_p50"], 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "index_build_plus_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extra,
    }))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
