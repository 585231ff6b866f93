"""Round-8 fine-grained profiler: run store.build's sub-steps
SEQUENTIALLY with individual timers (no thread overlap) so each
sub-step's cost is visible. Mirrors index_store.IndexStore.build.

Usage: python bench_extra2.py [sf|synth]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODE = sys.argv[1] if len(sys.argv) > 1 else "synth"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_DOCS = int(os.environ.get("BENCH_SYNTH_DOCS", "20000"))
SF_DIR = "/root/testdata/sf1.0"


def main() -> None:
    from pyspark.sql import functions as F

    from search_engine_skillbox_spark.operators.build import (
        postings_flat_fused)
    from search_engine_skillbox_spark.operators.index_store import (
        IndexStore, make_block_encoder, BLOCKS_SCHEMA)
    from search_engine_skillbox_spark.session import get_spark
    from search_engine_skillbox_spark.sources.corpus import pages_df
    from search_engine_skillbox_spark.sources.pages import prepare_pages

    spark = get_spark("bench_extra2", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    sc = spark.sparkContext
    tmp = tempfile.mkdtemp(prefix="bx2_")
    times: dict = {}

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        r = fn()
        times[name] = round(time.time() - t0, 3)
        print(f"  {name}: {times[name]}", file=sys.stderr)
        sc.setJobDescription(None)
        return r

    if MODE == "sf":
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        raw = docs.select(
            F.concat(F.lit("https://"), F.col("source"), F.lit(".test/doc/"),
                     F.col("doc_id")).alias("url"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            F.col("text"), F.col("lang"))
        n_buckets, salt_threshold, groups_n = 16, 100_000, 1
    else:
        corpus_path = os.path.join(tmp, "corpus")
        pages_df(spark, SYNTH_DOCS, 42,
                 partitions=CPUS * 2).write.parquet(corpus_path)
        raw = spark.read.parquet(corpus_path)
        n_buckets, salt_threshold, groups_n = 32, 50_000, 4
    raw.count()  # warm scan

    # --- prepare_pages sub-steps
    from search_engine_skillbox_spark.functions.urlutils import (
        normalize_url, url_host, url_path)
    from search_engine_skillbox_spark.functions.textprep import with_text
    p0 = raw.withColumn("url_norm", normalize_url(F.col("url")))
    ts = F.coalesce(F.col("warc_ts"),
                    F.lit("1970-01-01 00:00:00").cast("timestamp"))
    p1 = (p0.groupBy("url_norm")
          .agg(F.max_by(F.struct("url", "warc_ts", "html", "text", "lang"),
                        ts).alias("r"))
          .select("url_norm", "r.*"))
    timed("prep_dedup_only_noop",
          lambda: p1.write.format("noop").mode("overwrite").save())
    p2 = with_text(p1)
    p3 = (p2.withColumn("host", url_host(F.col("url_norm")))
          .withColumn("path", url_path(F.col("url_norm")))
          .withColumn("doc_id", F.xxhash64(F.col("url_norm"))))
    timed("prep_full_noop",
          lambda: p3.write.format("noop").mode("overwrite").save())
    prepared = prepare_pages(raw).persist()
    timed("prep_persist_materialize", lambda: prepared.count())

    # --- build sub-steps, sequential
    path = os.path.join(tmp, "store")
    store = IndexStore(path, n_buckets=n_buckets,
                       salt_threshold=salt_threshold)
    postings = postings_flat_fused(prepared).persist()
    timed("postings_noop",
          lambda: postings.write.format("noop").mode("overwrite").save())
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
    timed("terms_count", lambda: terms_full.count())
    doclens = postings.groupBy("doc_id").agg(
        F.max("dl").cast("int").alias("dl")).persist()
    g = timed("doclens_agg",
              lambda: doclens.agg(F.sum("dl").alias("s"),
                                  F.count(F.lit(1)).alias("n")).first())
    sum_dl, n_docs_total = int(g["s"] or 0), int(g["n"] or 0)
    avgdl = sum_dl / n_docs_total if n_docs_total else 0.0
    encoder = make_block_encoder(avgdl)

    heavy = terms_full.filter(F.col("n_salt") > 1).select("term", "n_salt")
    salted = (postings.join(F.broadcast(heavy), "term", "left")
              .withColumn("salt",
                          F.when(F.col("n_salt").isNull(), F.lit(0))
                          .otherwise(F.pmod(F.xxhash64(F.col("doc_id")),
                                            F.col("n_salt")).cast("int")))
              .withColumn("bucket", bucket.cast("int"))
              .select("term", "salt", "doc_id", "tf", "dl", "bucket"))

    shuffle_parts = CPUS
    per_group = math.ceil(n_buckets / groups_n)
    groups = [list(range(gg, min(gg + per_group, n_buckets)))
              for gg in range(0, n_buckets, per_group)]

    # dims sub-steps sequentially
    doc_bucket = F.pmod(F.xxhash64(F.col("doc_id")),
                        F.lit(n_buckets)).cast("int")
    timed("dims_w_terms",
          lambda: terms_full.write.mode("overwrite").partitionBy("bucket")
          .parquet(os.path.join(path, "terms")))
    timed("dims_w_doclens",
          lambda: (doclens.join(prepared.select("doc_id", "host"), "doc_id")
                   .withColumn("doc_bucket", doc_bucket)
                   .repartition(n_buckets, F.col("doc_bucket"))
                   .sortWithinPartitions("doc_bucket", "doc_id")
                   .write.mode("overwrite")
                   .option("parquet.block.size", 1024 * 1024)
                   .partitionBy("doc_bucket")
                   .parquet(os.path.join(path, "doclens"))))
    host_bucket = F.pmod(F.xxhash64(F.col("host")),
                         F.lit(n_buckets)).cast("int")
    timed("dims_w_docs",
          lambda: (prepared.select("doc_id", "url", "url_norm", "host",
                                   "path", "text", "lang", "warc_ts")
                   .withColumn("doc_bucket", doc_bucket)
                   .withColumn("host_bucket", host_bucket)
                   .repartition(n_buckets, F.col("doc_bucket"))
                   .sortWithinPartitions("host_bucket", "doc_bucket",
                                         "host", "doc_id")
                   .write.mode("overwrite")
                   .partitionBy("host_bucket", "doc_bucket")
                   .parquet(os.path.join(path, "docs"))))

    def agg_host():
        rows = (postings
                .join(F.broadcast(prepared.select("doc_id", "host")),
                      "doc_id")
                .groupBy("host")
                .agg(F.countDistinct("doc_id").alias("nd"),
                     F.countDistinct("term").alias("nt"))
                .collect())
        prows = prepared.groupBy("host").count().collect()
        return rows, prows
    timed("dims_agg_host", agg_host)

    # block groups sequentially
    for gi, buckets in enumerate(groups):
        def run():
            part = (salted.filter(F.col("bucket").isin(buckets))
                    .repartition(shuffle_parts, "term", "salt")
                    .sortWithinPartitions("term", "salt", "doc_id")
                    .mapInPandas(encoder, BLOCKS_SCHEMA)
                    .withColumn("gen", F.lit(0))
                    .withColumn("bucket",
                                F.pmod(F.xxhash64(F.col("term")),
                                       F.lit(n_buckets)).cast("int")))
            (part.repartition(len(buckets), F.col("bucket"))
             .sortWithinPartitions("bucket", "term", "tier",
                                   F.desc_nulls_last("max_imp"),
                                   F.desc("max_tf"), "salt", "block_id")
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .option("parquet.block.size", 4 * 1024 * 1024)
             .partitionBy("bucket")
             .parquet(os.path.join(path, "blocks")))
        timed(f"blocks_g{gi}", run)

    import json
    print(json.dumps({"mode": MODE, "times": times}, indent=1))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
