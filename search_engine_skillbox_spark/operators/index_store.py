"""Physical index: salted term-partitioned posting blocks on disk.

Layout (parquet stands in for Iceberg — same hidden-partitioning idea,
`bucket = pmod(xxhash64(term), n_buckets)` replaces Iceberg's
bucket(term) transform; partition pruning works identically through
parquet partition discovery):

    <dir>/blocks/bucket=<b>/   term,salt,block_id,n,max_tf,first_doc,
                               last_doc,docs:binary,tfs:binary
    <dir>/terms/               term,df,cf,max_tf,bucket
    <dir>/doclens/             doc_id,dl
    <dir>/docs/                doc_id,url,url_norm,host,path,text,lang
    <dir>/meta.json            n_docs, per-host n, avgdl, params
    <dir>/lineage.jsonl        per-bucket-group lineage rows

Build dataflow (SURVEY §3.2 Spark equivalent):
  postings_flat → broadcast-join heavy-term salt counts →
  repartitionByRange? no — hash repartition on (term, salt) →
  sortWithinPartitions(term, salt, doc_id) → mapInPandas encode
  (streaming group-carry, numpy codec) → parquet per bucket group.

Skew (north rule): a stopword term with df ~ 10^11 would pin one task
for hours. Terms with df > salt_threshold get n_salt =
ceil(df/salt_threshold) salts; salt = pmod(xxhash64(doc_id), n_salt)
spreads the term over n_salt independent posting runs whose blocks are
all tagged with the term — query-time union restores the full list
(doc-order within salt only, which OR-scoring never needs).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.checkpoint import Lineage
from .build import build_index_frames
from .codec import encode_postings

BLOCKS_SCHEMA = ("term string, salt int, block_id int, n int, max_tf int, "
                 "first_doc long, last_doc long, docs binary, tfs binary")


def _encode_partition(batches):
    """mapInPandas over (term, salt, doc_id, tf) sorted within partition by
    (term, salt, doc_id): stream-groups rows (a group may span Arrow
    batches — carried, never materialized beyond one salt run)."""
    carry_key: tuple | None = None
    ids_buf: list[np.ndarray] = []
    tfs_buf: list[np.ndarray] = []
    out: list[dict] = []

    def flush():
        nonlocal ids_buf, tfs_buf
        if carry_key is None:
            return
        ids = np.concatenate(ids_buf)
        tfs = np.concatenate(tfs_buf)
        for blk in encode_postings(ids, tfs):
            out.append({"term": carry_key[0], "salt": int(carry_key[1]), **blk})
        ids_buf, tfs_buf = [], []

    for pdf in batches:
        if pdf.empty:
            continue
        for (term, salt), g in pdf.groupby(["term", "salt"], sort=False):
            key = (term, salt)
            if key != carry_key:
                flush()
                carry_key = key
            ids_buf.append(g["doc_id"].to_numpy(np.int64))
            tfs_buf.append(g["tf"].to_numpy(np.int64))
        if len(out) >= 1024:
            yield pd.DataFrame(out)
            out = []
    flush()
    if out:
        yield pd.DataFrame(out)
    elif carry_key is None:
        yield pd.DataFrame(
            {c: pd.Series(dtype=d) for c, d in [
                ("term", "object"), ("salt", "int32"), ("block_id", "int32"),
                ("n", "int32"), ("max_tf", "int32"), ("first_doc", "int64"),
                ("last_doc", "int64"), ("docs", "object"), ("tfs", "object")]})


class IndexStore:
    def __init__(self, path: str, n_buckets: int = 32,
                 salt_threshold: int = 50_000):
        self.path = path
        self.n_buckets = n_buckets
        self.salt_threshold = salt_threshold

    # ---------------- build ----------------

    def build(self, spark: SparkSession, prepared: DataFrame,
              build_id: str = "b0", checkpoint_groups: int = 4,
              fail_after_group: int | None = None) -> dict:
        """prepared: output of sources.pages.prepare_pages.

        checkpoint_groups: number of sequential bucket groups, each one
        an atomic resume unit with a lineage row. fail_after_group is a
        test hook to simulate a crash mid-build.
        """
        lineage = Lineage(os.path.join(self.path, "lineage.jsonl"))
        done = lineage.done_partitions(build_id)

        postings, terms, _ = build_index_frames(prepared)
        postings = postings.persist()
        terms = terms.persist()
        # Materialize the caches before the dims/blocks threads fork: two
        # lazy threads racing an unmaterialized persist() compute the whole
        # lineage twice (observed as duplicated 128-task stages). ONE job
        # suffices — computing terms scans postings, so the postings cache
        # fills as a side effect of the same pass.
        terms.count()
        # dl = Σ tf from postings — avoids re-tokenizing the whole corpus;
        # zero-term docs have no postings and BM25 never weights them
        doclens = postings.groupBy("doc_id").agg(
            F.sum("tf").cast("int").alias("dl"))

        bucket = F.pmod(F.xxhash64(F.col("term")), F.lit(self.n_buckets))

        # salted skew handling: few heavy terms → broadcast their salt counts
        heavy = (terms.filter(F.col("df") > self.salt_threshold)
                 .select("term",
                         F.ceil(F.col("df") / self.salt_threshold)
                         .cast("int").alias("n_salt")))
        salted = (postings.join(F.broadcast(heavy), "term", "left")
                  .withColumn(
                      "salt",
                      F.when(F.col("n_salt").isNull(), F.lit(0)).otherwise(
                          F.pmod(F.xxhash64(F.col("doc_id")),
                                 F.col("n_salt")).cast("int")))
                  .withColumn("bucket", bucket.cast("int"))
                  .select("term", "salt", "doc_id", "tf", "bucket"))

        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        per_group = math.ceil(self.n_buckets / checkpoint_groups)
        groups = [list(range(g, min(g + per_group, self.n_buckets)))
                  for g in range(0, self.n_buckets, per_group)]

        # per-term max tf for WAND upper bounds, stored on the terms table
        max_tf = postings.groupBy("term").agg(
            F.max("tf").cast("int").alias("max_tf"))
        terms_full = (terms.join(max_tf, "term")
                      .withColumn("bucket", bucket.cast("int")))

        # Dimension tables + stats run CONCURRENTLY with the block groups
        # (separate output dirs, independent lineage units): a multi-job
        # Spark scheduler interleaves their stages into idle task slots,
        # removing the serial dims tail that otherwise caps N→4N scaling
        # (Amdahl; measured 33 s flat at every level before this change).
        def run_dims() -> None:
            pid = "dims"
            if pid in lineage.done_partitions(build_id):
                return
            t0 = lineage.start(build_id, pid)
            try:
                doc_bucket = F.pmod(F.xxhash64(F.col("doc_id")),
                                    F.lit(self.n_buckets)).cast("int")
                stats: dict = {}

                def w_terms():
                    (terms_full.write.mode("overwrite").partitionBy("bucket")
                     .parquet(os.path.join(self.path, "terms")))

                def w_doclens():
                    (doclens.withColumn("doc_bucket", doc_bucket)
                     .repartition(self.n_buckets, F.col("doc_bucket"))
                     .write.mode("overwrite").partitionBy("doc_bucket")
                     .parquet(os.path.join(self.path, "doclens")))

                def w_docs():
                    (prepared.select("doc_id", "url", "url_norm", "host",
                                     "path", "text", "lang")
                     .withColumn("doc_bucket", doc_bucket)
                     .repartition(self.n_buckets, F.col("doc_bucket"))
                     .write.mode("overwrite").partitionBy("doc_bucket")
                     .parquet(os.path.join(self.path, "docs")))

                def agg_global():
                    # one pass over postings: Σtf == Σdl and the distinct
                    # doc count == |docs with ≥1 posting| == n_dl == N
                    r = postings.agg(
                        F.sum("tf").alias("s"),
                        F.countDistinct("doc_id").alias("n")).first()
                    stats["sum_dl"] = int(r["s"] or 0)
                    stats["n_docs"] = int(r["n"] or 0)

                def agg_host():
                    rows = (postings
                            .join(prepared.select("doc_id", "host"), "doc_id")
                            .groupBy("host")
                            .agg(F.countDistinct("doc_id").alias("nd"),
                                 F.countDistinct("term").alias("nt"))
                            .collect())
                    stats["per_host"] = {r["host"]: r["nd"] for r in rows}
                    stats["terms_by_host"] = {r["host"]: r["nt"] for r in rows}

                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(5) as pool:
                    futs = [pool.submit(f) for f in
                            (w_terms, w_doclens, w_docs, agg_global, agg_host)]
                    for f in futs:
                        f.result()

                n_docs = stats["n_docs"]
                sum_dl = stats["sum_dl"]
                avgdl = (sum_dl / n_docs) if n_docs else 0.0
                meta = {"n_docs": n_docs,
                        "n_docs_by_host": stats["per_host"],
                        "gen": 0, "sum_dl": sum_dl, "n_dl": n_docs,
                        "n_terms_by_host": stats["terms_by_host"],
                        "avgdl": float(avgdl),
                        "n_buckets": self.n_buckets,
                        "salt_threshold": self.salt_threshold,
                        "build_id": build_id}
                with open(os.path.join(self.path, "meta.json"), "w") as f:
                    json.dump(meta, f)
                lineage.done(build_id, pid, t0, rows=n_docs,
                             nbytes=_dir_bytes(self.path))
            except Exception as e:
                lineage.failed(build_id, pid, t0, str(e))
                raise

        from concurrent.futures import ThreadPoolExecutor as _TPE
        dims_pool = _TPE(1)
        dims_fut = dims_pool.submit(run_dims)

        blocks_err: Exception | None = None
        try:
            for gi, buckets in enumerate(groups):
                pid = f"blocks-g{gi}"
                if pid in done:
                    continue
                t0 = lineage.start(build_id, pid)
                try:
                    part = (salted.filter(F.col("bucket").isin(buckets))
                            .repartition(shuffle_parts, "term", "salt")
                            .sortWithinPartitions("term", "salt", "doc_id")
                            .mapInPandas(_encode_partition, BLOCKS_SCHEMA)
                            .withColumn("gen", F.lit(0))
                            .withColumn(
                                "bucket",
                                F.pmod(F.xxhash64(F.col("term")),
                                       F.lit(self.n_buckets)).cast("int")))
                    target = os.path.join(self.path, "blocks")
                    # coalesce encoded (small, compressed) rows to one task
                    # per bucket: 32 output files instead of tasks×buckets,
                    # an order less driver-side commit work (A/B'd: wins)
                    (part.repartition(len(buckets), F.col("bucket"))
                     .write.mode("overwrite")
                     .option("partitionOverwriteMode", "dynamic")
                     .partitionBy("bucket").parquet(target))
                    if fail_after_group is not None and gi >= fail_after_group:
                        raise RuntimeError(
                            f"synthetic failure after group {gi}")
                    lineage.done(build_id, pid, t0, rows=len(buckets),
                                 nbytes=_dir_bytes(target))
                except Exception as e:  # mirror FAILED(lastError)
                    lineage.failed(build_id, pid, t0, str(e))
                    blocks_err = e
                    raise
        finally:
            try:
                dims_fut.result()
            except Exception:
                if blocks_err is None:
                    dims_pool.shutdown()
                    raise
            dims_pool.shutdown()

        postings.unpersist()
        terms.unpersist()
        self.invalidate_reads()
        return self.meta()

    # ---------------- read ----------------

    def meta(self) -> dict:
        with open(os.path.join(self.path, "meta.json")) as f:
            return json.load(f)

    def write_meta(self, meta: dict) -> None:
        with open(os.path.join(self.path, "meta.json"), "w") as f:
            json.dump(meta, f)

    def tombstones(self, spark: SparkSession) -> DataFrame | None:
        """(doc_id, dead_gen): postings of doc_id with gen ≤ dead_gen are
        deleted. None when no incremental delete has happened yet."""
        p = os.path.join(self.path, "tombstones")
        if not os.path.isdir(p):
            return None
        return spark.read.parquet(p)

    def _cached(self, spark: SparkSession, name: str) -> DataFrame:
        """Reuse DataFrame handles per (session, table): parquet file
        listing + schema inference run once per session instead of per
        query (repeat-query latency). Invalidated by incremental writes
        via invalidate_reads()."""
        cache = getattr(self, "_read_cache", None)
        if cache is None:
            cache = self._read_cache = {}
        key = (id(spark), name)
        if key not in cache:
            cache[key] = spark.read.parquet(os.path.join(self.path, name))
        return cache[key]

    def invalidate_reads(self) -> None:
        self._read_cache = {}

    def blocks(self, spark: SparkSession) -> DataFrame:
        return self._cached(spark, "blocks")

    def terms(self, spark: SparkSession) -> DataFrame:
        return self._cached(spark, "terms")

    def doclens(self, spark: SparkSession) -> DataFrame:
        return self._cached(spark, "doclens")

    def docs(self, spark: SparkSession) -> DataFrame:
        return self._cached(spark, "docs")

    def query_blocks(self, spark: SparkSession, q_terms: list[str]) -> DataFrame:
        """Blocks of the query terms with partition pruning. Buckets are
        computed DRIVER-SIDE (functions/hashing.py reimplements Spark's
        xxhash64 bit-for-bit) — zero Spark jobs to plan the scan; the
        bucket predicate prunes partition dirs and the term predicate is
        pushed into parquet row groups."""
        from ..functions.hashing import term_bucket
        buckets = sorted({term_bucket(t, self.n_buckets) for t in q_terms})
        return (self.blocks(spark)
                .filter(F.col("bucket").isin(buckets))
                .filter(F.col("term").isin(q_terms)))

    def query_terms_rows(self, spark: SparkSession, q_terms: list[str]):
        """terms-table rows for the query terms, bucket-pruned the same way."""
        from ..functions.hashing import term_bucket
        buckets = sorted({term_bucket(t, self.n_buckets) for t in q_terms})
        return (self.terms(spark)
                .filter(F.col("bucket").isin(buckets))
                .filter(F.col("term").isin(q_terms)).collect())


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total
