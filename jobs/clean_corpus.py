"""spark-submit entry point: run the resumable corpus-cleaning chain
(operators/pipeline.clean_corpus) over a documents-shaped parquet table
(doc_id, text, lang, ...).

    spark-submit --py-files engine.zip jobs/clean_corpus.py \
        --input /data/raw_docs --workdir /data/clean_work \
        [--sample-rate 0.5] [--bench /data/eval_prompts] \
        [--structural-gopher] [--build-id my-run]

Re-running with the same input + workdir RESUMES: stages whose lineage
row is DONE are skipped (kill the job mid-stage-5 and only stage 5+
re-runs). Prints one JSON line with per-stage stats and the final
cleaned parquet path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents-shaped parquet dir (doc_id, text, ...)")
    ap.add_argument("--workdir", required=True,
                    help="stage outputs + lineage.jsonl live here")
    ap.add_argument("--sample-rate", type=float, default=0.5)
    ap.add_argument("--bench", default=None,
                    help="parquet dir of held-out eval text (id, text) "
                         "for decontamination; default: the doc_id %% "
                         "997 == 0 slice stands in")
    ap.add_argument("--structural-gopher", action="store_true",
                    help="drop the stopword-presence cue (synthetic "
                         "corpora with no real en/ru stopwords)")
    ap.add_argument("--build-id", default=None,
                    help="override the input-fingerprinted default "
                         "(resume across in-place mtime rewrites)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from search_engine_skillbox_spark.operators import pipeline as P

    spark = SparkSession.builder.appName("clean_corpus").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    bench = spark.read.parquet(args.bench) if args.bench else None
    res = P.clean_corpus(
        spark, args.input, args.workdir,
        stages=P.default_clean_stages(
            gopher_structural_only=args.structural_gopher,
            bench=bench, sample_rate=args.sample_rate),
        build_id=args.build_id,
        # the bench CONTENT is part of the resume identity: swapping
        # eval suites must re-run decontamination, not serve stale
        # DONE stages
        extra_sig=(P._dir_fingerprint(args.bench) if args.bench else ""))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
