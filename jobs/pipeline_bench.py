"""spark-submit entry point: the training-data pipeline measured
end-to-end at non-toy scale — generate an N-doc corpus (deterministic,
with planted duplicates), then run the cleaning stages the way a real
corpus build chains them, each stage reading the previous stage's
parquet and writing its own (honest timings: scan + compute + write):

    gopher filter → exact dedup → minhash-LSH near-dedup →
    benchmark decontamination → deterministic sample → PII redaction

Prints ONE JSON line: per-stage seconds, rows in/out, docs/s. The
artifact goes to BENCH/ so scale claims about the pipeline operators
are measured, not asserted.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--workdir", default="/tmp/pipeline_bench")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from search_engine_skillbox_spark.functions import textstats as TS
    from search_engine_skillbox_spark.operators import dedup as D
    from search_engine_skillbox_spark.operators import pipeline as P

    spark = SparkSession.builder.appName("pipeline_bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir)

    def path(name: str) -> str:
        return os.path.join(args.workdir, name)

    # ---- corpus: documents-shaped, deterministic; every 100th doc is
    # an exact duplicate of its neighbor so dedup has real work
    seed = args.seed

    def gen(batches):
        import pandas as pd

        from search_engine_skillbox_spark.sources.corpus import doc_tokens
        for pdf in batches:
            ids = pdf["id"].tolist()
            texts = []
            for d in ids:
                src = d - 7 if (d % 100 == 7 and d >= 7) else d
                texts.append(" ".join(doc_tokens(seed, int(src))))
            yield pd.DataFrame({
                "doc_id": ids, "text": texts,
                "lang": [["ru", "en", "mixed"][d % 3] for d in ids]})

    t0 = time.time()
    (spark.range(args.docs).repartition(64)
     .mapInPandas(gen, "doc_id long, text string, lang string")
     .write.mode("overwrite").parquet(path("raw")))
    gen_sec = round(time.time() - t0, 1)

    stages: list[dict] = []
    cur = "raw"
    n_cur = spark.read.parquet(path(cur)).count()

    def stage(name: str, fn) -> None:
        nonlocal cur, n_cur
        t0 = time.time()
        out = fn(spark.read.parquet(path(cur)))
        out.write.mode("overwrite").parquet(path(name))
        sec = time.time() - t0
        n_out = spark.read.parquet(path(name)).count()
        stages.append({"stage": name, "sec": round(sec, 1),
                       "rows_in": n_cur, "rows_out": n_out,
                       "docs_per_sec": round(n_cur / sec, 1)})
        cur, n_cur = name, n_out

    # vocabulary-neutral Gopher signals only: the synthetic corpus has
    # no real en/ru stopwords, so the stopword-presence cue (and the
    # composite gopher_pass) would zero it — the bench measures the
    # same projection + the structural thresholds
    stage("gopher_filter", lambda df: df.select(
        "doc_id", "text", "lang",
        *TS.gopher_quality(F.col("text")))
        .filter((F.col("n_words") >= TS.GOPHER_MIN_WORDS)
                & (F.col("n_words") <= TS.GOPHER_MAX_WORDS)
                & (F.col("mean_word_len") >= TS.GOPHER_MIN_MEAN_WL)
                & (F.col("mean_word_len") <= TS.GOPHER_MAX_MEAN_WL)
                & (F.col("symbol_ratio") <= TS.GOPHER_MAX_SYMBOL_RATIO)
                & (F.col("alpha_word_frac")
                   >= TS.GOPHER_MIN_ALPHA_WORD_FRAC))
        .select("doc_id", "text", "lang"))

    stage("exact_dedup", lambda df: D.dedup_keep_first(df))

    def near_dedup(df):
        pairs = D.minhash_lsh_pairs(df, m=16, bands=4, k=3,
                                    threshold=0.8, max_bucket=1000)
        losers = pairs.select(F.col("doc2").alias("doc_id")).distinct()
        return df.join(F.broadcast(losers), "doc_id", "left_anti")
    stage("minhash_neardedup", near_dedup)

    def decontam(df):
        bench = (df.filter(F.col("doc_id") % 997 == 0)
                 .select(F.col("doc_id").alias("bench_id"), "text"))
        hits = P.decontaminate(df, bench, n=8).filter(
            "contamination >= 0.8").select("doc_id")
        return df.join(F.broadcast(hits), "doc_id", "left_anti")
    stage("decontaminate", decontam)

    stage("sample_50pct", lambda df: P.sample_by_hash(df, 0.5))

    stage("pii_redact", lambda df: P.pii_redact(df).withColumnRenamed(
        "clean_text", "text"))

    total = round(sum(s["sec"] for s in stages), 1)
    print(json.dumps({
        "metric": "pipeline_end_to_end_sec", "value": total,
        "unit": "sec", "docs": args.docs, "gen_sec": gen_sec,
        "stages": stages,
        "final_rows": n_cur,
        "overall_docs_per_sec": round(args.docs / total, 1)}))


if __name__ == "__main__":
    main()
