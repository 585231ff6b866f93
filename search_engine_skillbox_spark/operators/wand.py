"""Block-max pruned top-k over the physical index (MaxScore/WAND family;
north_rule: "top-k retrieval via block-max WAND scoring").

Exact-by-construction two-pass scheme over per-block upper bounds
UB(b) = max_tf(b) · idf(term(b)) (compat mode; BM25 uses the dl-free
conservative tf-norm bound, operators/score.py):

  pass 1  decode only the blocks of t* = argmax_t UBmax(t) and compute
          per-doc PARTIAL scores (t* contribution alone). The k-th best
          partial is a valid lower bound θ on the k-th best FINAL score
          (partials underestimate; the true top-k each dominate their
          own partial).
  prune   a block b of term t ≠ t* may be skipped iff
              UB(b) + Σ_{t'≠t} UBmax(t') < θ
          Proof of exactness: for any doc e with true(e) ≥ θ and any
          block b ∋ e of term t: true(e) ≤ UB(b) + Σ_{t'≠t} UBmax(t'),
          so b survives — every final-top-k doc keeps ALL its
          contributions; pruned docs' underestimated scores stay < θ ≤
          k-th best, so they cannot displace anyone.
  pass 2  decode surviving blocks, union with pass-1 rows,
          groupBy(doc).sum → exact top-k.

The prune compiles to a per-term `max_tf ≥ ceil((θ − Σ_other)/idf_t)`
predicate — a plain column filter pushed into the parquet scan, so
skipped blocks' binary columns are never read (row-group stats on
max_tf do the skipping). Stopword terms (idf → 0) prune to nothing the
moment θ > Σ UBmax of the cheap terms — the reference's worst case
(every doc matches a stopword) costs us metadata only.

Tests assert top-k identity vs the plain-DataFrame path (operators/
query.py) on every fixture query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import score as S
from .codec import decode_block
from .index_store import IndexStore

DECODED_SCHEMA = "doc_id long, term string, tf long, gen int"


def _decode_blocks(batches):
    for pdf in batches:
        if pdf.empty:
            continue
        ids_all, tf_all, term_all, gen_all = [], [], [], []
        for term, docs_b, tfs_b, gen in zip(pdf["term"], pdf["docs"],
                                            pdf["tfs"], pdf["gen"]):
            d, t = decode_block(docs_b, tfs_b)
            ids_all.append(d)
            tf_all.append(t)
            term_all.append(np.repeat(term, d.size))
            gen_all.append(np.full(d.size, gen, np.int32))
        yield pd.DataFrame({
            "doc_id": np.concatenate(ids_all),
            "term": np.concatenate(term_all),
            "tf": np.concatenate(tf_all),
            "gen": np.concatenate(gen_all),
        })


def decoded_postings(blocks: DataFrame) -> DataFrame:
    """blocks → (doc_id, term, tf, gen) via the Arrow-batched decoder."""
    return blocks.select("term", "docs", "tfs", "gen").mapInPandas(
        _decode_blocks, DECODED_SCHEMA)


def live_postings(spark: SparkSession, store: IndexStore,
                  blocks: DataFrame) -> DataFrame:
    """Decoded postings minus tombstoned generations (incremental S9
    deletes; operators/incremental.py). Tombstones are tiny → broadcast
    left join, keep rows with gen > dead_gen."""
    dec = decoded_postings(blocks)
    tomb = store.tombstones(spark)
    if tomb is None:
        return dec.drop("gen")
    return (dec.join(F.broadcast(tomb), "doc_id", "left")
            .filter(F.col("dead_gen").isNull()
                    | (F.col("gen") > F.col("dead_gen")))
            .drop("gen", "dead_gen"))


def _decode_docids_only(batches):
    from .codec import varint_decode
    for pdf in batches:
        if pdf.empty:
            continue
        ids, gens = [], []
        for docs_b, gen in zip(pdf["docs"], pdf["gen"]):
            deltas = varint_decode(docs_b)
            z = deltas[0]
            with np.errstate(over="ignore"):
                first = np.int64((z >> np.uint64(1))
                                 ^ (~(z & np.uint64(1)) + np.uint64(1)))
            d = deltas.astype(np.int64)
            d[0] = first
            ids.append(np.cumsum(d))
            gens.append(np.full(len(d), gen, np.int32))
        yield pd.DataFrame({"doc_id": np.concatenate(ids),
                            "gen": np.concatenate(gens)})


def decoded_docids(blocks: DataFrame) -> DataFrame:
    """blocks → (doc_id, gen) only — skips tf decode; used for exact
    match counts where tf is irrelevant."""
    return blocks.select("docs", "gen").mapInPandas(_decode_docids_only,
                                                    "doc_id long, gen int")


def live_docids(spark: SparkSession, store: IndexStore,
                blocks: DataFrame) -> DataFrame:
    dec = decoded_docids(blocks)
    tomb = store.tombstones(spark)
    if tomb is None:
        return dec.select("doc_id")
    return (dec.join(F.broadcast(tomb), "doc_id", "left")
            .filter(F.col("dead_gen").isNull()
                    | (F.col("gen") > F.col("dead_gen")))
            .select("doc_id"))


def site_topk(spark: SparkSession, store: IndexStore, q_terms: list[str],
              k: int, host: str, mode: str = "compat") -> DataFrame:
    """T9/J2: site-filtered exact top-k served FROM the physical index
    (no per-site rebuild).

    The reference recomputes df and N within the site on every query
    (repository/IndexRepository.java:41-50, site JPQL;
    service/SearchServiceImpl.java:81-106). Spark shape:

      1. N(site) comes from the per-host doc counts persisted at build
         time (meta.json n_docs_by_host) — zero jobs.
      2. Candidates = decoded postings of the query terms only
         (partition-pruned blocks scan), inner-joined to the
         (doc_id, host) column-pruned projection of docs/ filtered to
         the host. Cost is bounded by Σ df of the query terms — the
         same bound as the global path — never by corpus or site size.
      3. Within-site df per term = countDistinct(doc) over those
         candidates (the reference's countDocsByLemmaAndSite).
      4. idf from (df_site, N_site); OR-sum score; exact top-k.

    Block-max pruning is skipped here: per-block max_tf bounds are
    global, not per-host, so they cannot tighten θ within a site; the
    candidate set is already term-pruned, which is the dominant filter.
    """
    empty = "doc_id long, score double"
    if not q_terms:
        return spark.createDataFrame([], empty)
    meta = store.meta()
    n_site = int(meta.get("n_docs_by_host", {}).get(host, 0))
    if n_site <= 0:
        return spark.createDataFrame([], empty)
    present = [r["term"] for r in store.query_terms_rows(spark, q_terms)]
    if not present:
        return spark.createDataFrame([], empty)

    dhost = (store.docs(spark).select("doc_id", "host")
             .filter(F.col("host") == host).select("doc_id"))
    qblocks = store.query_blocks(spark, present)
    cand = live_postings(spark, store, qblocks).join(dhost, "doc_id").persist()
    try:
        site_df = {r["term"]: r["df"] for r in
                   cand.groupBy("term")
                   .agg(F.countDistinct("doc_id").alias("df")).collect()}
        idf_py = S.idf_compat_py if mode == "compat" else S.idf_bm25_py
        idf = {t: idf_py(site_df.get(t, 0), n_site) for t in present}
        idf_df = F.broadcast(spark.createDataFrame(
            [(t, float(idf[t])) for t in present], "term string, idf double"))
        c = cand.join(idf_df, "term")
        if mode == "compat":
            w = S.tf_weight_compat(F.col("tf"))
        else:
            c = c.join(store.doclens(spark), "doc_id")
            w = S.tf_weight_bm25(F.col("tf"), F.col("dl"), meta["avgdl"])
        rows = (c.select("doc_id", (w * F.col("idf")).alias("contrib"))
                .groupBy("doc_id").agg(F.sum("contrib").alias("score"))
                .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
                .collect())
        return spark.createDataFrame(rows, empty)
    finally:
        cand.unpersist()


EXHAUSTIVE_POSTINGS_BUDGET = 5_000_000


def wand_topk(spark: SparkSession, store: IndexStore, q_terms: list[str],
              k: int, mode: str = "compat",
              exhaustive_budget: int = EXHAUSTIVE_POSTINGS_BUDGET) -> DataFrame:
    """Exact top-k (doc_id, score) using block-max pruning.

    Adaptive: when Σ df over the query terms is below exhaustive_budget,
    the two-pass pruning cannot beat one straight decode+agg job — a
    single Spark action wins on scheduling overhead (driver-decided from
    the terms dictionary alone; the plans are result-identical, verified
    in tests both ways).

    Returns the same rows as query.topk(candidate_scores(...), k) on the
    flat postings — verified in tests/test_index_store.py.
    """
    if not q_terms:
        return spark.createDataFrame([], "doc_id long, score double")
    meta = store.meta()
    n_docs = meta["n_docs"]
    tstats = {r["term"]: (r["df"], r["max_tf"])
              for r in store.query_terms_rows(spark, q_terms)}
    present = [t for t in q_terms if t in tstats]
    if not present:
        return spark.createDataFrame([], "doc_id long, score double")

    if mode == "compat":
        idf = {t: S.idf_compat_py(tstats[t][0], n_docs) for t in present}
        ubmax = {t: tstats[t][1] * idf[t] for t in present}
    else:
        idf = {t: S.idf_bm25_py(tstats[t][0], n_docs) for t in present}
        ubmax = {t: S.upper_bound_bm25(tstats[t][1], idf[t]) for t in present}

    sum_df = sum(tstats[t][0] for t in present)
    small = sum_df <= exhaustive_budget

    qblocks = store.query_blocks(spark, present)
    if not small:
        qblocks = qblocks.persist()
    try:
        if small:
            idf_small = F.broadcast(spark.createDataFrame(
                [(t, float(idf[t])) for t in present],
                "term string, idf double"))
            c = live_postings(spark, store, qblocks).join(idf_small, "term")
            if mode == "compat":
                w = S.tf_weight_compat(F.col("tf"))
            else:
                c = c.join(store.doclens(spark), "doc_id")
                w = S.tf_weight_bm25(F.col("tf"), F.col("dl"), meta["avgdl"])
            rows = (c.select("doc_id", (w * F.col("idf")).alias("contrib"))
                    .groupBy("doc_id").agg(F.sum("contrib").alias("score"))
                    .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
                    .collect())
            return spark.createDataFrame(rows, "doc_id long, score double")
        t_star = max(present, key=lambda t: ubmax[t])
        others = [t for t in present if t != t_star]

        idf_df = F.broadcast(spark.createDataFrame(
            [(t, float(idf[t])) for t in present], "term string, idf double"))

        def contributions(decoded: DataFrame) -> DataFrame:
            c = decoded.join(idf_df, "term")
            if mode == "compat":
                w = S.tf_weight_compat(F.col("tf"))
            else:
                dls = store.doclens(spark)
                c = c.join(dls, "doc_id")
                w = S.tf_weight_bm25(F.col("tf"), F.col("dl"), meta["avgdl"])
            return c.select("doc_id", (w * F.col("idf")).alias("contrib"))

        # ---- pass 1: t* partials → θ (aggregated once, reused in the union)
        p1 = (contributions(
                live_postings(spark, store,
                              qblocks.filter(F.col("term") == t_star)))
              .groupBy("doc_id").agg(F.sum("contrib").alias("contrib"))
              .persist())
        theta_rows = (p1.orderBy(F.desc("contrib"), F.asc("doc_id"))
                      .limit(k).collect())
        theta = theta_rows[-1]["contrib"] if len(theta_rows) >= k else float("-inf")

        if not others:
            return spark.createDataFrame(
                [(r["doc_id"], r["contrib"]) for r in theta_rows],
                "doc_id long, score double")

        # ---- prune predicate per other term (pushed into the scan)
        sum_all = sum(ubmax[t] for t in present)
        keep = None
        for t in others:
            sum_other = sum_all - ubmax[t]
            if mode == "compat":
                # UB(b) = max_tf · idf_t ≥ θ − Σ_other
                if idf[t] <= 0:
                    continue  # zero contribution — exact skip
                min_maxtf = (theta - sum_other) / idf[t]
            else:
                # invert the conservative bm25 bound analytically:
                # bound(m) = idf·m·A/(m+C), A=k1+1, C=k1(1−b), monotone in m
                lo = theta - sum_other
                A = S.K1_DEFAULT + 1.0
                C = S.K1_DEFAULT * (1.0 - S.B_DEFAULT)
                if lo <= 0:
                    min_maxtf = 0.0
                elif idf[t] * A - lo <= 0:
                    min_maxtf = tstats[t][1] + 1  # sup(bound) < lo: skip all
                else:
                    min_maxtf = lo * C / (idf[t] * A - lo)
            cond = (F.col("term") == t) & (F.col("max_tf") >= float(min_maxtf))
            keep = cond if keep is None else (keep | cond)

        if keep is None:
            survivors = qblocks.filter(F.lit(False))
        else:
            survivors = qblocks.filter(keep)
        p2 = contributions(live_postings(spark, store, survivors))

        out = (p1.unionAll(p2)
               .groupBy("doc_id").agg(F.sum("contrib").alias("score"))
               .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
        rows = out.collect()

        # Zero tier: the reference's OR semantics admits docs whose every
        # matched term has idf 0 (score 0.0) as real results
        # (SearchServiceImpl.java:139-160 — any match scores). Pruning is
        # only exact while the k-th score is strictly positive; once k
        # reaches the zero tier, fall back to exhaustive decode (exact,
        # and rare: only when fewer than k docs score > 0).
        if len(rows) < k or (rows and rows[-1]["score"] <= 0):
            rows = (contributions(live_postings(spark, store, qblocks))
                    .groupBy("doc_id").agg(F.sum("contrib").alias("score"))
                    .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
                    .collect())
        return spark.createDataFrame(rows, "doc_id long, score double")
    finally:
        qblocks.unpersist()
        try:
            p1.unpersist()
        except Exception:
            pass
