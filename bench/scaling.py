"""North-rule scaling evidence: the identical index-build job on the
identical input at two parallelism levels (local[8] vs local[32] — the
sandbox substitute for N vs 4N executors, per BASELINE.md protocol),
plus query latency at both, plus per-term/per-salt skew evidence.

Writes results to BENCH/BASELINE.md. Run:  python bench/scaling.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS = int(os.environ.get("SCALE_DOCS", "2000000"))
SHUFFLE = int(os.environ.get("SCALE_SHUFFLE", "128"))  # sized for local[32]
LEVELS = tuple(int(x) for x in
               os.environ.get("SCALE_LEVELS", "8,32").split(","))
BEST_OF = int(os.environ.get("SCALE_BEST_OF", "2"))
OUT_TAG = os.environ.get("SCALE_TAG", "")  # suffix for report files
# 8M-doc runs need more than 24g: local mode shares ONE JVM between
# driver and all executor threads, and 16 threads caching the
# materialize checkpoint plus an AQE broadcast build overflow 24g
# (observed: "Not enough memory to build and broadcast" at 8M/local[16])
DRIVER_MEM = os.environ.get("SCALE_DRIVER_MEM", "24g")


def settle(target: float = 1.5, max_wait: int = 300) -> None:
    """Wait for the box to go quiet before a timed run. Identical
    commands measured 88-165 s on this sandbox depending on residual
    load/writeback from the previous phase — without settling, the
    protocol measures host noise, not the engine."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < target:
            return
        time.sleep(10)


def spark_submit(cpus: int, script: str, *args: str) -> dict:
    settle()
    # taskset pins the WHOLE process tree (JVM + python workers) to an
    # N-core budget — without it, pandas-UDF workers run outside the
    # local[N] thread budget and the N-core level silently uses ~2N
    # cores, invalidating the N→4N comparison.
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}",
        "spark-submit", "--master", f"local[{cpus}]",
        "--conf", f"spark.sql.shuffle.partitions={SHUFFLE}",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.driver.memory={DRIVER_MEM}",
        "--conf", "spark.sql.adaptive.enabled=true",
        # task-side commit (v2): output files move at task commit instead
        # of a serial driver-side job-commit rename pass
        "--conf",
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=2",
        "--py-files", os.path.join(REPO, "engine.zip"),
        os.path.join(REPO, script), *args,
    ]
    t0 = time.time()
    # 16M-doc builds at 2 cores run ~2h — the per-run ceiling must be
    # configurable (SCALE_TIMEOUT seconds, default 1h)
    res = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=int(os.environ.get("SCALE_TIMEOUT",
                                                    "3600")))
    wall = time.time() - t0
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    if not line:
        # keep the FULL logs: a 2h run's root exception (e.g. the first
        # OOM) scrolls far past any tail-sized excerpt
        dump = tempfile.mkstemp(prefix="scale_fail_", suffix=".log")[1]
        with open(dump, "w") as f:
            f.write(" ".join(cmd) + "\n--- stdout ---\n" + res.stdout
                    + "\n--- stderr ---\n" + res.stderr)
        sys.stderr.write(res.stdout[-2000:] + res.stderr[-4000:])
        raise RuntimeError(
            f"no JSON from {script} at local[{cpus}] (full log: {dump})")
    out = json.loads(line[-1])
    out["wall_sec"] = round(wall, 1)
    out["cmd"] = " ".join(cmd)
    return out


def skew_evidence(corpus: str) -> dict:
    """Per-(term,salt) posting-run sizes with and without salting —
    proves the salt bound on the largest encode run."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from search_engine_skillbox_spark.operators.build import (
        build_index_frames)
    from search_engine_skillbox_spark.sources.pages import prepare_pages

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", str(SHUFFLE))
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "24g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    prep = prepare_pages(spark.read.parquet(corpus))
    postings, terms, _ = build_index_frames(prep)
    postings = postings.persist()
    thr = 50_000
    heavy = (terms.filter(F.col("df") > thr)
             .select("term", F.ceil(F.col("df") / thr).cast("int")
                     .alias("n_salt")))
    salted = (postings.join(F.broadcast(heavy), "term", "left")
              .withColumn("salt", F.when(F.col("n_salt").isNull(), F.lit(0))
                          .otherwise(F.pmod(F.xxhash64("doc_id"),
                                            F.col("n_salt")).cast("int"))))
    runs = (salted.groupBy("term", "salt").count()
            .agg(F.max("count").alias("max_run"),
                 F.expr("percentile_approx(count, 0.999)").alias("p999"),
                 F.count(F.lit(1)).alias("n_runs")).first())
    unsalted = (postings.groupBy("term").count()
                .agg(F.max("count").alias("max_run")).first())
    top = (postings.groupBy("term").count().orderBy(F.desc("count"))
           .limit(10).collect())
    out = {
        "salt_threshold": thr,
        "max_run_unsalted": unsalted["max_run"],
        "max_run_salted": runs["max_run"],
        "p999_run_salted": runs["p999"],
        "n_runs": runs["n_runs"],
        "top_terms": [(r["term"], r["count"]) for r in top],
    }
    spark.stop()
    return out


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="scale_")
    # SCALE_CORPUS: reuse an existing generated corpus (supplementary
    # reruns after a harness failure — generation is deterministic, so
    # same docs count → same corpus)
    corpus = os.environ.get("SCALE_CORPUS") or os.path.join(tmp, "corpus")

    if not os.path.isdir(corpus):
        # untimed deterministic corpus generation (same input for both
        # levels) — in a SUBPROCESS, so the generator JVM has fully
        # exited before any timed build starts (an in-process
        # SparkSession.stop() leaves the py4j JVM idling in this
        # harness for its lifetime)
        gen = subprocess.run(
            ["spark-submit", "--master", "local[32]",
             "--conf", "spark.ui.enabled=false",
             "--conf", "spark.driver.memory=24g",
             "--py-files", os.path.join(REPO, "engine.zip"),
             os.path.join(REPO, "jobs/gen_corpus.py"),
             "--docs", str(DOCS), "--output", corpus],
            capture_output=True, text=True, timeout=3600)
        if not os.path.isdir(corpus):
            sys.stderr.write(gen.stdout[-2000:] + gen.stderr[-4000:])
            raise RuntimeError("corpus generation failed")

    results = {}
    for cpus in LEVELS:
        idx = os.path.join(tmp, f"idx{cpus}")
        # best-of-N builds (identical command, fresh output dir): the
        # sandbox's run-to-run variance is 1.5-1.9x; min is the honest
        # estimator of the engine's cost (noise only ever adds time)
        attempts = []
        for rep in range(BEST_OF):
            if os.path.isdir(idx):
                shutil.rmtree(idx)
            attempts.append(spark_submit(
                cpus, "jobs/build_index.py", "--input", corpus,
                "--output", idx, "--buckets", "32", "--assume-unique",
                "--salt-threshold", "50000", "--checkpoint-groups", "4"))
        build = min(attempts, key=lambda a: a["seconds"])
        build["attempts_sec"] = [a["seconds"] for a in attempts]
        query = spark_submit(cpus, "jobs/query_bench.py", "--index", idx,
                             "--reps", "5")
        results[cpus] = {"build": build, "query": query}
        print(json.dumps({cpus: results[cpus]}), flush=True)

    lo, hi = LEVELS[0], LEVELS[-1]
    r8 = results[lo]["build"]["docs_per_sec"]
    r32 = results[hi]["build"]["docs_per_sec"]
    eff = r32 / ((hi // lo) * r8)
    # supplementary runs can skip the (untimed) skew-evidence pass — it
    # re-derives the same salted-run-size facts every time
    if os.environ.get("SCALE_SKIP_SKEW"):
        skew = {"skipped": True}
    else:
        skew = skew_evidence(corpus)

    report = {"docs": DOCS, "shuffle_partitions": SHUFFLE,
              "levels": list(LEVELS),
              "r8_docs_per_sec": r8, "r32_docs_per_sec": r32,
              "t8_sec": results[lo]["build"]["seconds"],
              "t32_sec": results[hi]["build"]["seconds"],
              "attempts": {c: results[c]["build"].get("attempts_sec")
                           for c in LEVELS},
              "scaling_efficiency": round(eff, 3),
              "query": {c: results[c]["query"] for c in LEVELS},
              "skew": skew}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_json = f"scaling_results{OUT_TAG}.json"
    with open(os.path.join(REPO, "BENCH", out_json), "w") as f:
        json.dump(report, f, indent=2)
    if not OUT_TAG:  # tagged runs are supplementary evidence only
        _write_md(report, results)
    print(json.dumps(report))
    shutil.rmtree(tmp, ignore_errors=True)


def _write_md(rep: dict, results: dict) -> None:
    lo, hi = rep.get("levels", [8, 32])[0], rep.get("levels", [8, 32])[-1]
    q8, q32 = rep["query"][lo], rep["query"][hi]
    md = f"""# BENCH/BASELINE — measured results

## Index-build throughput & N→4N scaling (north-rule protocol)

Same deterministic input ({rep['docs']:,} synthetic Common-Crawl-style
pages, seed 42), same shuffle partitions ({rep['shuffle_partitions']}),
identical `spark-submit --py-files engine.zip jobs/build_index.py` at
two parallelism levels:

| level | wall (build job `seconds`, best of {BEST_OF}) | docs/sec |
|---|---|---|
| local[{lo}]  (N)  | {rep['t8_sec']} s | {rep['r8_docs_per_sec']} |
| local[{hi}] (4N) | {rep['t32_sec']} s | {rep['r32_docs_per_sec']} |

All attempts (sec): {rep.get('attempts')}

**Scaling efficiency E = R32 / (4·R8) = {rep['scaling_efficiency']}**
(target ≥ 0.8 → {"PASS" if rep['scaling_efficiency'] >= 0.8 else "FAIL"}).

Exact commands:

```
{results[lo]['build']['cmd']}
{results[hi]['build']['cmd']}
```

## Top-k query latency (block-max WAND, k=10, 5-query reference mix × 10 reps)

| level | compat p50 | compat p95 | bm25 p50 | bm25 p95 |
|---|---|---|---|---|
| local[{lo}]  | {q8['compat_p50_sec']} s | {q8['compat_p95_sec']} s | {q8['bm25_p50_sec']} s | {q8['bm25_p95_sec']} s |
| local[{hi}] | {q32['compat_p50_sec']} s | {q32['compat_p95_sec']} s | {q32['bm25_p50_sec']} s | {q32['bm25_p95_sec']} s |

## Skew evidence (salted term partitioning, threshold {rep['skew']['salt_threshold']:,})

| metric | value |
|---|---|
| largest per-term posting run, unsalted | {rep['skew']['max_run_unsalted']:,} |
| largest per-(term,salt) run, salted | {rep['skew']['max_run_salted']:,} |
| p99.9 salted run | {rep['skew']['p999_run_salted']:,} |
| total (term,salt) runs | {rep['skew']['n_runs']:,} |

Top stopword-heavy terms (df): {', '.join(f"{t}={c:,}" for t, c in rep['skew']['top_terms'][:5])}

Raw JSON: `BENCH/scaling_results.json`.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
