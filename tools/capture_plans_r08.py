"""Capture .explain('formatted') artifacts for round-8 plan claims.

Usage: python tools/capture_plans_r08.py <repo_root> <suffix>
  repo_root: tree whose engine code to import (round-7 worktree for
             "before", this repo for "after")
  suffix:    "before" | "after"

Writes plans/r08/<name>_<suffix>.txt under THIS repo (cwd).
Small corpus (2k synth docs) — plan SHAPE is what matters, and the
round-8 plan changes are size-independent except where noted in the
artifact headers.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

ROOT = os.path.abspath(sys.argv[1])
SUFFIX = sys.argv[2]
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r08")
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, ROOT)

N_DOCS = 2000


def grab(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def write(name: str, header: str, text: str) -> None:
    p = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
    with open(p, "w") as f:
        f.write(f"# {name} ({SUFFIX})\n# {header}\n\n{text}")
    n_ex = text.count("Exchange")
    print(f"wrote {p}  (Exchange nodes: {n_ex})")


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from search_engine_skillbox_spark.operators import build as B
    from search_engine_skillbox_spark.operators.index_store import IndexStore
    from search_engine_skillbox_spark.session import get_spark
    from search_engine_skillbox_spark.sources.corpus import pages_df
    from search_engine_skillbox_spark.sources.pages import prepare_pages
    from search_engine_skillbox_spark.operators.pipeline import pii_redact

    spark = get_spark("plans_r08", master="local[8]", shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="plans_r08_")
    raw = pages_df(spark, N_DOCS, 42, partitions=8)
    prepared = prepare_pages(raw).persist()
    prepared.count()

    # 1. prepare_pages (dedup + text extraction + identity columns)
    write("prepare_pages", "corpus -> deduped pages with identity cols",
          grab(prepared))

    # 2. fused postings kernel (round 8: carries host; session 2: the
    # kernel emits ONE row per doc and the flat view is a JVM explode)
    docs_fused = None
    if hasattr(B, "postings_fused_docs"):
        docs_fused = B.postings_fused_docs(prepared,
                                           host_col="host").persist()
        docs_fused.count()
        postings = B.explode_postings(docs_fused, with_host=True)
    else:
        try:
            postings = B.postings_flat_fused(prepared, host_col="host")
        except TypeError:  # round-7 signature
            postings = B.postings_flat_fused(prepared)
        postings = postings.persist()
        postings.count()
    write("build_postings_fused", "tokenize+tf one Arrow pass"
          + (" (per-doc kernel + explode view)" if docs_fused is not None
             else ""),
          grab(postings))

    # 3. doclens dimension write input (round 8: no corpus join;
    # session 2: no aggregation at all — a select of the per-doc cache)
    if docs_fused is not None:
        doclens = docs_fused.select(
            "doc_id", F.col("dl").cast("int").alias("dl"), "host")
        dl_plan = doclens
    elif "host" in postings.columns:
        doclens = postings.groupBy("doc_id").agg(
            F.max("dl").cast("int").alias("dl"),
            F.min("host").alias("host"))
        dl_plan = doclens
    else:
        doclens = postings.groupBy("doc_id").agg(
            F.max("dl").cast("int").alias("dl"))
        dl_plan = doclens.join(prepared.select("doc_id", "host"), "doc_id")
    write("build_doclens_dim",
          "doclens rows as written to the doclens/ dimension",
          grab(dl_plan))

    # 4. per-host stats aggregation
    if "host" in postings.columns:
        hs = (postings.groupBy("host")
              .agg(F.countDistinct("term").alias("nt")))
    else:
        hs = (postings
              .join(F.broadcast(prepared.select("doc_id", "host")),
                    "doc_id")
              .groupBy("host")
              .agg(F.countDistinct("doc_id").alias("nd"),
                   F.countDistinct("term").alias("nt")))
    write("build_host_stats", "per-host dictionary stats aggregation",
          grab(hs))

    # 5. the full physical build, then inspect the store layout
    store = IndexStore(os.path.join(tmp, "idx"), n_buckets=8,
                       salt_threshold=100_000)
    store.build(spark, prepared, checkpoint_groups=2)
    import glob
    files = {d: len(glob.glob(os.path.join(tmp, "idx", d, "**", "*.parquet"),
                              recursive=True))
             for d in ("docs", "doclens", "terms", "blocks")}
    with open(os.path.join(OUT, f"store_layout_{SUFFIX}.txt"), "w") as f:
        f.write(f"# parquet file counts per store table ({SUFFIX}, "
                f"{N_DOCS} docs, n_buckets=8)\n{files}\n")
    print("store layout:", files)

    # 6. pii_redact (round 8: marker-delta counts, 2 regex passes not 4)
    write("pii_redact", "PII redaction projection",
          grab(pii_redact(prepared.select("doc_id", "text"))))

    # 7. distributed wand small path (plan unchanged by design;
    # serving path has NO Spark plan — job counts in bench JSON)
    from search_engine_skillbox_spark.operators.wand import wand_topk
    t = (store.terms(spark).orderBy(F.desc("df")).limit(1)
         .collect()[0]["term"])
    write("wand_topk_distributed",
          "distributed top-k (serving=False), small-budget path",
          grab(wand_topk(spark, store, [t], 10, serving=False)))

    spark.stop()


if __name__ == "__main__":
    main()
