"""Inverted-index construction (reference indexing path, SURVEY §3.2).

The reference builds its index one page at a time with ~3 MySQL round
trips per distinct lemma per page (utils/PageIndexingUtils.java:128-159,
the N+1 pattern). Here the whole build is three Catalyst-planned jobs:

  postings_flat : docs → tokenize → explode → groupBy(doc,term).count()
                  (A1: per-page tf, ref utils/PageIndexingUtils.java:119-126)
  terms         : groupBy(term) → df=countDistinct(doc), cf=sum(tf)
                  (A2/A3: ref utils/PageIndexingUtils.java:134 and
                   repository/IndexRepository.java:37-39 — exact, not
                   approximate, because IDF must be score-identical)
  meta          : N = countDistinct(doc) over postings — counts only
                  index-participating docs, i.e. docs whose text tokenizes
                  to ≥1 term (A4: ref repository/IndexRepository.java:46-47)

Scale notes (10^12 docs, 1000 executors):
  * tokenize+explode+count is map-side-combinable: Spark's hash aggregate
    does partial aggregation per task before the single shuffle on
    (doc_id, term). No Python in the hot path — `tokens()` is built-ins.
  * `terms` re-shuffles by term; stopword terms are heavy but the
    aggregation value is two longs, so skew is benign here. Skew matters
    for the *physical posting layout*, handled by salted repartition in
    operators/codec.py + build_posting_blocks below.
  * df/cf are computed once at build time and persisted — the reference
    recomputes df per query (4 SQL round trips per search); we read a
    broadcast-sized dictionary instead.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textprep import tokens


def postings_flat(docs: DataFrame, doc_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) — the relational inverted index.

    One shuffle (partial+final hash agg). Equivalent of the reference's
    `search_index` table rows (model/IndexEntity.java:10-26) where
    rank_value is the per-page term count stored as float.
    """
    return (
        docs.select(F.col(doc_col).alias("doc_id"),
                    F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def postings_flat_fused(docs: DataFrame, doc_col: str = "doc_id",
                        text_col: str = "text",
                        host_col: str | None = None) -> DataFrame:
    """(doc_id, term, tf, dl[, host]) in ONE Arrow pass — tokenize AND
    per-doc tf aggregation inside the Python kernel (PY_TOKEN_SPLIT, the
    byte-identical twin of the JVM `\\P{L}+` tokenizer; twin equality is
    pinned by the streaming≡batch test and the index_block_roundtrip /
    search_wand_topk gate rows, which verify blocks built THROUGH this
    path against a DuckDB recompute).

    Why it exists: all terms of a doc live in its own input row, so tf
    needs no (doc_id, term) exchange at all — this is a NARROW
    transformation. It replaces the two widest shuffles of the physical
    build: the explode→groupBy(doc,term) exchange (~Σdl rows) and the
    doc-keyed doclens join that round 2 added to carry dl into every
    posting for join-free BM25 (dl now rides out of the same kernel).
    The logical/oracle path (postings_flat) stays JVM-side built-ins.

    host_col: when set, the doc's host rides on every posting row the
    same way dl does — the build's per-host statistics and the doclens
    dimension then need NO doc-keyed join back to the corpus at all
    (at 10^12 docs a doc→host map no longer broadcasts; one short
    string per posting row in a cached, column-pruned frame does).
    """
    import numpy as np
    import pandas as pd

    def _gen(batches):
        from collections import Counter

        from ..functions.textprep import PY_TOKEN_SPLIT
        for pdf in batches:
            # per-DOC accumulators + one np.repeat fan-out per batch:
            # building the per-POSTING doc_id/dl/host columns as Python
            # lists ([v] * len(c) extends) costs ~µs per posting — at
            # 800M postings (4M docs) that alone was ~70 s of the
            # materialize phase; np.repeat is a C-loop over per-doc
            # arrays instead.
            d_ids: list = []
            d_dls: list = []
            d_n: list = []
            d_hosts: list = []
            terms: list = []
            tfs: list = []
            hseq = pdf[host_col] if host_col else None
            for i, (doc_id, text) in enumerate(
                    zip(pdf[doc_col], pdf[text_col])):
                # Counter(list) takes the C fast path; a `+` split
                # pattern can only yield empty strings at the run's
                # ends, so popping '' afterwards is exactly the old
                # per-token `if t` filter (measured ~1.2× on the
                # tokenize+count loop, the kernel's dominant cost)
                c = Counter(PY_TOKEN_SPLIT.split((text or "").lower()))
                c.pop("", None)
                if not c:
                    continue
                d_ids.append(doc_id)
                d_dls.append(sum(c.values()))
                d_n.append(len(c))
                terms.extend(c.keys())
                tfs.extend(c.values())
                if hseq is not None:
                    d_hosts.append(hseq.iloc[i])
            reps = np.asarray(d_n, np.int64)
            out = {"doc_id": pd.Series(
                       np.repeat(np.asarray(d_ids, np.int64), reps)),
                   "term": pd.Series(terms, dtype="object"),
                   "tf": pd.Series(tfs, dtype="int64"),
                   "dl": pd.Series(
                       np.repeat(np.asarray(d_dls, np.int64), reps))}
            if host_col:
                out["host"] = pd.Series(
                    np.repeat(np.asarray(d_hosts, dtype=object), reps))
            yield pd.DataFrame(out)

    cols = [F.col(doc_col).alias(doc_col), F.col(text_col).alias(text_col)]
    schema = "doc_id long, term string, tf long, dl long"
    if host_col:
        cols.append(F.col(host_col).alias(host_col))
        schema += ", host string"
    return docs.select(*cols).mapInPandas(_gen, schema)


def doc_lengths(docs: DataFrame, doc_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, dl) token count per doc — needed by BM25 length norm."""
    return docs.select(
        F.col(doc_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).alias("dl"),
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """(term, df, cf): document frequency + collection frequency.

    df is exact COUNT(DISTINCT doc) — but since postings_flat already has
    one row per (doc, term), df == COUNT(*) within a term group, which
    Catalyst executes as a cheap partial+final count with NO distinct
    shuffle. cf mirrors the reference's lemma.frequency accumulation
    (utils/PageIndexingUtils.java:134).
    """
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )


def corpus_size(postings: DataFrame) -> int:
    """A4: N = number of docs with ≥1 indexed term (NOT all doc rows —
    ref repository/IndexRepository.java:46-47 counts over search_index)."""
    return postings.select("doc_id").distinct().count()


@dataclass
class IndexStats:
    n_docs: int        # index-participating docs (A4 semantics)
    avgdl: float       # average doc length over participating docs
    n_terms: int       # distinct terms


def build_index_frames(docs: DataFrame, doc_col: str = "doc_id",
                       text_col: str = "text"):
    """Slice-2 logical index: (postings, terms, doclens). Callers persist
    or write these; the physical block layout is operators/codec.py +
    jobs/build_index.py."""
    p = postings_flat(docs, doc_col, text_col)
    return p, term_stats(p), doc_lengths(docs, doc_col, text_col)
