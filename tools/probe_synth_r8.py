"""Round-8 sequential probe: time each build sub-step of the SYNTH
bench corpus with the CURRENT (round-8) dataflow shapes, no thread
overlap, min-of-N per step where cheap. Usage:
    python tools/probe_synth_r8.py [n_docs]
"""
from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 20000


def main() -> None:
    from pyspark.sql import functions as F

    from search_engine_skillbox_spark.operators.build import (
        postings_flat_fused)
    from search_engine_skillbox_spark.operators.index_store import (
        BLOCKS_SCHEMA, IndexStore, _adaptive_doc_buckets,
        _adaptive_host_buckets, make_block_encoder)
    from search_engine_skillbox_spark.session import get_spark
    from search_engine_skillbox_spark.sources.corpus import pages_df
    from search_engine_skillbox_spark.sources.pages import prepare_pages

    spark = get_spark("probe_synth_r8", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    sc = spark.sparkContext
    tmp = tempfile.mkdtemp(prefix="probe_r8_")
    times: dict = {}

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        r = fn()
        times[name] = round(time.time() - t0, 3)
        print(f"  {name}: {times[name]}", file=sys.stderr)
        sc.setJobDescription(None)
        return r

    corpus_path = os.path.join(tmp, "corpus")
    pages_df(spark, N_DOCS, 42,
             partitions=CPUS * 2).write.parquet(corpus_path)
    raw = spark.read.parquet(corpus_path)
    raw.count()

    n_buckets, salt_threshold = 32, 50_000
    prepared = prepare_pages(raw).persist()
    timed("prep_materialize", lambda: prepared.count())

    postings = postings_flat_fused(prepared, host_col="host").persist()
    bucket = F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets))
    terms_full = (postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.max("tf").cast("int").alias("max_tf"))
        .withColumn("n_salt",
                    F.when(F.col("df") > salt_threshold,
                           F.ceil(F.col("df") / salt_threshold))
                    .otherwise(F.lit(1)).cast("int"))
        .withColumn("bucket", bucket.cast("int"))
        .persist())
    timed("materialize_agg", lambda: terms_full.agg(
        F.count(F.lit(1)).alias("n"), F.max("df").alias("mdf")).first())
    doclens = postings.groupBy("doc_id").agg(
        F.max("dl").cast("int").alias("dl"),
        F.first("host").alias("host")).persist()
    per_host_rows = timed("doclens_host_agg", lambda: (
        doclens.groupBy("host")
        .agg(F.count(F.lit(1)).alias("nd"), F.sum("dl").alias("s"))
        .collect()))
    nd_by_host = {r["host"]: int(r["nd"]) for r in per_host_rows}
    sum_dl = sum(int(r["s"] or 0) for r in per_host_rows)
    n_docs_total = sum(nd_by_host.values())
    avgdl = sum_dl / n_docs_total if n_docs_total else 0.0
    encoder = make_block_encoder(avgdl)
    n_doc_buckets = _adaptive_doc_buckets(n_docs_total)
    n_host_buckets = _adaptive_host_buckets(len(nd_by_host))
    print(f"  n_doc_buckets={n_doc_buckets} n_host_buckets={n_host_buckets}",
          file=sys.stderr)

    salted = (postings
              .withColumn("salt", F.lit(0).cast("int"))
              .withColumn("bucket", bucket.cast("int"))
              .select("term", "salt", "doc_id", "tf", "dl", "bucket"))

    shuffle_parts = CPUS
    path = os.path.join(tmp, "store")

    # shared encode (round-8 small-build path)
    encoded_all = (salted
                   .repartition(shuffle_parts, "term", "salt")
                   .sortWithinPartitions("term", "salt", "doc_id")
                   .mapInPandas(encoder, BLOCKS_SCHEMA)
                   .withColumn("gen", F.lit(0))
                   .withColumn("bucket",
                               F.pmod(F.xxhash64(F.col("term")),
                                      F.lit(n_buckets)).cast("int"))
                   .persist())
    timed("shared_encode_count", lambda: encoded_all.count())

    # dims sub-steps, round-8 shapes, sequential
    doc_bucket = F.pmod(F.xxhash64(F.col("doc_id")),
                        F.lit(n_doc_buckets)).cast("int")
    timed("w_terms", lambda: (
        terms_full.repartition(n_buckets, F.col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(os.path.join(path, "terms"))))
    timed("w_doclens", lambda: (
        doclens.select("doc_id", "dl", "host")
        .withColumn("doc_bucket", doc_bucket)
        .repartition(n_doc_buckets, F.col("doc_bucket"))
        .sortWithinPartitions("doc_bucket", "doc_id")
        .write.mode("overwrite")
        .option("parquet.block.size", 1024 * 1024)
        .partitionBy("doc_bucket")
        .parquet(os.path.join(path, "doclens"))))

    host_bucket = F.pmod(F.xxhash64(F.col("host")),
                         F.lit(n_host_buckets)).cast("int")
    base = (prepared.select("doc_id", "url", "url_norm", "host", "path",
                            "text", "lang", "warc_ts")
            .withColumn("doc_bucket", doc_bucket)
            .withColumn("host_bucket", host_bucket))
    n_dirs = n_host_buckets * n_doc_buckets
    per_task = 12500
    w_tasks = max(1, min(shuffle_parts, -(-n_docs_total // per_task)))
    sub = max(1, -(-2 * w_tasks // n_dirs))
    print(f"  w_tasks={w_tasks} sub={sub}", file=sys.stderr)
    base = base.repartition(w_tasks, F.col("host_bucket"),
                            F.col("doc_bucket"),
                            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(sub)))
    timed("w_docs", lambda: (
        base.sortWithinPartitions("host_bucket", "doc_bucket", "host",
                                  "doc_id")
        .write.mode("overwrite")
        .option("parquet.block.size", 256 * 1024)
        .partitionBy("host_bucket", "doc_bucket")
        .parquet(os.path.join(path, "docs"))))

    timed("agg_host_nt", lambda: (
        postings.groupBy("host")
        .agg(F.countDistinct("term").alias("nt")).collect()))
    timed("agg_pages", lambda: prepared.groupBy("host").count().collect())

    # block group writes from cache (4 groups sequential)
    per_group = math.ceil(n_buckets / 4)
    groups = [list(range(g, min(g + per_group, n_buckets)))
              for g in range(0, n_buckets, per_group)]
    for gi, buckets in enumerate(groups):
        part = encoded_all.filter(F.col("bucket").isin(buckets))
        timed(f"w_blocks_g{gi}", lambda p=part, b=buckets: (
            p.repartition(len(b), F.col("bucket"))
            .sortWithinPartitions("bucket", "term", "tier",
                                  F.desc_nulls_last("max_imp"),
                                  F.desc("max_tf"), "salt", "block_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("parquet.block.size", 4 * 1024 * 1024)
            .partitionBy("bucket")
            .parquet(os.path.join(path, "blocks"))))

    print(json.dumps({"n_docs": N_DOCS, "times": times}))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
