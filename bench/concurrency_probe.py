"""Clean end-to-end concurrency probe (VERDICT r3 next-round item #4).

Question it answers: is the ~12-14k docs/s ingest ceiling at >=16
cores a property of the ENGINE (JVM-internal contention, dataflow
serialization) or of the SOCKET (physical memory bandwidth)?  Method:
run TWO fully independent pinned local[8] builds of the same 8M-doc
corpus CONCURRENTLY (cores 0-7 vs 8-15, separate JVMs, separate
output dirs).  If process isolation recovered throughput, the ceiling
would be engine-internal; if the concurrent aggregate still sits at
the ceiling, the limiter is shared hardware that a multi-node cluster
scales with node count.

Round 3 ran this ad-hoc and both runs died on transient disk-full
during the final dimension writes, leaving only lineage phase-sum
evidence.  This script is the headline-grade rerun: it checks free
disk up front (needs ~30 GB: one 4.4 GB corpus + two ~9 GB indexes +
shuffle staging), uses subprocess end-to-end walls (the same
`jobs/build_index.py` JSON contract as bench/scaling.py), and writes
`BENCH/concurrency_probe.json`.

Run:  python bench/concurrency_probe.py
Env:  PROBE_DOCS (default 8_000_000), PROBE_CORPUS (reuse an existing
      corpus), PROBE_KEEP (keep outputs), PROBE_SOLO=1 (also run one
      solo local[8] build afterwards for a same-session baseline).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS = int(os.environ.get("PROBE_DOCS", "8000000"))
SHUFFLE = 256  # sized for 8M docs (BENCH/BASELINE.md shuffle finding)
DRIVER_MEM = "48g"
TIMEOUT = int(os.environ.get("PROBE_TIMEOUT", "7200"))


def settle(target: float = 1.5, max_wait: int = 300) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < target:
            return
        time.sleep(10)


def build_cmd(cores: str, cpus: int, corpus: str, out: str) -> list[str]:
    return [
        "taskset", "-c", cores,
        "spark-submit", "--master", f"local[{cpus}]",
        "--conf", f"spark.sql.shuffle.partitions={SHUFFLE}",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.driver.memory={DRIVER_MEM}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf",
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=2",
        "--py-files", os.path.join(REPO, "engine.zip"),
        os.path.join(REPO, "jobs/build_index.py"),
        "--input", corpus, "--output", out, "--buckets", "32",
        "--assume-unique", "--salt-threshold", "50000",
        "--checkpoint-groups", "4",
    ]


def run_build(cores: str, cpus: int, corpus: str, out: str,
              slot: dict) -> None:
    cmd = build_cmd(cores, cpus, corpus, out)
    t0 = time.time()
    try:
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=TIMEOUT)
        wall = time.time() - t0
        line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
        if not line:
            slot["error"] = (res.stdout[-1500:] + res.stderr[-3000:])
            return
        rec = json.loads(line[-1])
        rec["wall_sec"] = round(wall, 1)
        rec["cores"] = cores
        slot["result"] = rec
    except Exception as exc:  # timeout, json error
        slot["error"] = f"{type(exc).__name__}: {exc}"


def main() -> None:
    free_gb = shutil.disk_usage("/tmp").free / 2**30
    if free_gb < 30:
        raise SystemExit(f"need >=30 GB free in /tmp, have {free_gb:.1f}")

    tmp = tempfile.mkdtemp(prefix="probe_")
    corpus = os.environ.get("PROBE_CORPUS") or os.path.join(tmp, "corpus")
    if not os.path.isdir(corpus):
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

    settle()
    a: dict = {}
    b: dict = {}
    ta = threading.Thread(target=run_build, args=(
        "0-7", 8, corpus, os.path.join(tmp, "idxA"), a))
    tb = threading.Thread(target=run_build, args=(
        "8-15", 8, corpus, os.path.join(tmp, "idxB"), b))
    t0 = time.time()
    ta.start()
    tb.start()
    ta.join()
    tb.join()
    span = round(time.time() - t0, 1)

    report: dict = {"docs": DOCS, "shuffle_partitions": SHUFFLE,
                    "driver_memory": DRIVER_MEM,
                    "concurrent_span_sec": span,
                    "runs": {"A": a, "B": b}}
    if "result" in a and "result" in b:
        ra = DOCS / a["result"]["seconds"]
        rb = DOCS / b["result"]["seconds"]
        report["aggregate_docs_per_sec_sum_of_rates"] = round(ra + rb, 1)
        # the stricter aggregate: both corpora done when the SLOWER
        # finishes, measured by the build-phase seconds (excludes each
        # JVM's startup + corpus-schema read, same convention as the
        # ladder numbers this compares against)
        report["aggregate_docs_per_sec_joint"] = round(
            2 * DOCS / max(a["result"]["seconds"],
                           b["result"]["seconds"]), 1)
        report["aggregate_docs_per_sec_wallclock"] = round(
            2 * DOCS / span, 1)

    if os.environ.get("PROBE_SOLO"):
        settle()
        s: dict = {}
        run_build("0-7", 8, corpus, os.path.join(tmp, "idxS"), s)
        report["solo"] = s
        if "result" in s:
            report["solo_docs_per_sec"] = round(
                DOCS / s["result"]["seconds"], 1)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "concurrency_probe.json"),
              "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    if not os.environ.get("PROBE_KEEP"):
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
