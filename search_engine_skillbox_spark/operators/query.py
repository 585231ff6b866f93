"""Query path: candidate retrieval + scoring + top-k + pagination.

Reproduces GET /api/search (SURVEY §3.1, controllers/ApiController.java:43-51
→ service/SearchServiceImpl.java:27-71) as one Catalyst plan:

  1. query analysis (driver): distinct lemmas, first-occurrence order (T4)
  2. candidate retrieval: postings semi-joined to the query terms (T8) —
     expressed as isin() for short queries so Catalyst turns it into a
     pushed-down IN filter on the term-partitioned scan (partition pruning
     on the physical index; PushedFilters on parquet)
  3. idf per term (Q1) from the persisted terms dictionary (the reference
     recomputes df with SQL per query; we broadcast-join a k-row dict)
  4. OR-semantics score per doc (Q2): groupBy(doc).sum(tf·idf) —
     partial agg map-side; candidate set is tiny vs corpus
  5. order by (score desc, doc_id asc) — deterministic tie-break; the
     reference's tie order is HashMap-nondeterministic (Q3)
  6. pagination (Q4): offset/limit with the reference's exact edge cases
     (offset beyond result size ⇒ {result:false})

The plain-DataFrame path below is the correctness anchor; the block-max
WAND path (operators/wand.py) must stay top-k-identical to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textprep import distinct_query_terms
from . import score as S


def query_idf(terms: DataFrame, q_terms: list[str], n_docs: int,
              mode: str = "compat") -> DataFrame:
    """(term, idf) for the query terms. Terms absent from the dictionary
    get df=0 ⇒ idf=ln(N+1) in compat mode (SearchServiceImpl.java:129-137
    computes idf for every query lemma, found or not)."""
    spark = terms.sparkSession
    q = spark.createDataFrame([(t,) for t in q_terms], "term string")
    joined = q.join(F.broadcast(terms.filter(F.col("term").isin(q_terms))),
                    "term", "left").fillna({"df": 0})
    idf = (S.idf_compat if mode == "compat" else S.idf_bm25)(F.col("df").cast("double"), n_docs)
    return joined.select("term", idf.alias("idf"), "df")


def candidate_scores(postings: DataFrame, terms: DataFrame, n_docs: int,
                     q_terms: list[str], mode: str = "compat",
                     doclens: DataFrame | None = None,
                     avgdl: float | None = None) -> DataFrame:
    """(doc_id, score:double) for every doc containing ANY query term (Q2).

    The `isin` filter is pushed into the scan; the idf table is a ≤|q|-row
    broadcast. One shuffle: the final groupBy(doc_id).
    """
    if not q_terms:
        return postings.sparkSession.createDataFrame([], "doc_id long, score double")
    cand = postings.filter(F.col("term").isin(q_terms))
    idf = query_idf(terms, q_terms, n_docs, mode).select("term", "idf")
    cand = cand.join(F.broadcast(idf), "term")
    if mode == "compat":
        w = S.tf_weight_compat(F.col("tf"))
    else:
        assert doclens is not None and avgdl is not None
        cand = cand.join(doclens, "doc_id")
        w = S.tf_weight_bm25(F.col("tf"), F.col("dl"), avgdl)
    return (cand.groupBy("doc_id")
            .agg(F.sum(w * F.col("idf")).alias("score")))


def topk(scores: DataFrame, k: int) -> DataFrame:
    """Exact top-k with deterministic tie-break (score desc, doc_id asc).
    orderBy().limit() compiles to TakeOrderedAndProject — per-partition
    heaps + single driver merge, no full sort shuffle."""
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search(spark: SparkSession, postings: DataFrame, terms: DataFrame,
           n_docs: int, query: str, offset: int = 0, limit: int = 10,
           mode: str = "compat",
           doclens: DataFrame | None = None,
           avgdl: float | None = None) -> dict:
    """Full API-shaped search (minus hydration/snippets — present.py).

    Returns {result, count, data=[(doc_id, relevance:float32)]} with the
    reference's exact edge cases:
      * null/blank query → {result: False}        (SearchServiceImpl.java:29-31)
      * query w/ zero lemmas → {result: True, count: 0}     (:34-36)
      * N ≤ 0 or no candidates → {result: True, count: 0}   (:40-47)
      * offset beyond result size → {result: False}  (subList throws,
        swallowed by the catch-all, :162-166 + :68-70)
    """
    if query is None or not query.strip():
        return {"result": False, "count": 0, "data": []}
    q_terms = distinct_query_terms(query)
    if not q_terms:
        return {"result": True, "count": 0, "data": []}
    if n_docs <= 0:
        return {"result": True, "count": 0, "data": []}
    scores = candidate_scores(postings, terms, n_docs, q_terms, mode,
                              doclens, avgdl).persist()
    limit = max(1, limit)
    offset = max(0, offset)
    # count = total matches (not page size), SearchServiceImpl.java:58;
    # persist: the top-k and the count share one candidate scan
    page = topk(scores, offset + limit).collect()
    total = scores.count()
    scores.unpersist()
    if offset > total:
        return {"result": False, "count": 0, "data": []}
    import numpy as np
    data = [(r["doc_id"], float(np.float32(r["score"])))  # float32 cast, :146
            for r in page[offset:offset + limit]]
    return {"result": True, "count": total, "data": data}
