"""Pure-Python single-node oracle for the reference search semantics
(SURVEY §5.1). No Spark, no pandas — plain dicts and lists, directly
reviewable against the SURVEY citations:

  tokenize   \\P{L}+ split, lowercase      (MorphologyServiceImpl.java:13-20)
  tf         per-(doc,term) counts          (PageIndexingUtils.java:119-126)
  df/N       over participating docs only   (IndexRepository.java:37-50)
  idf        ln((N+1)/(df+1))               (SearchServiceImpl.java:133)
  score      OR-sum tf·idf, float32 final   (SearchServiceImpl.java:139-160)
  sort       score desc (tie nondeterministic → compare tie-aware)
  paginate   offset/limit edge cases        (SearchServiceImpl.java:162-166)

Extraction (T1) and presentation (T5-T7) reuse the engine's pure-Python
definitions (textprep.extract_text_py, present.build_*) — for those the
oracle *is* the definition (the reference has no tests; FIXTURES.md
declares the invariant definitional). What pytest then actually
verifies is that the distributed Spark pipeline — UDF batching,
shuffles, salting, codecs, WAND pruning — reproduces the single-node
computation exactly.
"""

from __future__ import annotations

import math
import struct
from collections import Counter

from search_engine_skillbox_spark.functions.textprep import (
    PY_TOKEN_SPLIT, extract_text_py)


def tokenize(text: str) -> list[str]:
    return [t for t in PY_TOKEN_SPLIT.split(text.lower()) if t]


def f32(x: float) -> float:
    return struct.unpack("f", struct.pack("f", x))[0]


class OracleIndex:
    def __init__(self, pages: list[dict]):
        """pages: rows with url/html (corpus.make_page shape)."""
        self.docs: dict[str, str] = {}      # url → extracted text
        self.tf: dict[str, Counter] = {}    # url → term counts
        for p in pages:
            text = p["text"] if p.get("text") is not None else extract_text_py(p["html"])
            self.docs[p["url"]] = text
            toks = tokenize(text)
            if toks:
                self.tf[p["url"]] = Counter(toks)
        self.df: Counter = Counter()
        self.cf: Counter = Counter()
        for counts in self.tf.values():
            for t, c in counts.items():
                self.df[t] += 1
                self.cf[t] += c
        self.n_docs = len(self.tf)  # A4: participating docs only

    def idf(self, term: str) -> float:
        return math.log((self.n_docs + 1) / (self.df.get(term, 0) + 1))

    def score_all(self, q_terms: list[str]) -> dict[str, float]:
        """OR semantics; double accumulation; float32 cast once per doc."""
        idf = {t: self.idf(t) for t in q_terms}
        out: dict[str, float] = {}
        for url, counts in self.tf.items():
            s = 0.0
            hit = False
            for t in q_terms:
                c = counts.get(t)
                if c:
                    hit = True
                    s += c * idf[t]
            if hit:
                out[url] = f32(s)
        return out

    def search(self, query: str, offset: int = 0, limit: int = 10) -> dict:
        from search_engine_skillbox_spark.functions.textprep import (
            distinct_query_terms)
        if query is None or not query.strip():
            return {"result": False, "count": 0, "data": []}
        q_terms = distinct_query_terms(query)
        if not q_terms or self.n_docs <= 0:
            return {"result": True, "count": 0, "data": []}
        scores = self.score_all(q_terms)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        limit = max(1, limit)
        offset = max(0, offset)
        if offset > len(ranked):
            return {"result": False, "count": 0, "data": []}
        page = ranked[offset:offset + limit]
        return {"result": True, "count": len(ranked),
                "data": [{"url": u, "relevance": s} for u, s in page]}

    # BM25 engine-default mode (k1=1.2, b=0.75, Lucene idf)
    def score_bm25(self, q_terms: list[str], k1=1.2, b=0.75) -> dict[str, float]:
        dls = {u: sum(c.values()) for u, c in self.tf.items()}
        avgdl = sum(dls.values()) / len(dls) if dls else 0.0
        out: dict[str, float] = {}
        for url, counts in self.tf.items():
            s = 0.0
            hit = False
            for t in q_terms:
                tf = counts.get(t)
                if not tf:
                    continue
                hit = True
                idf = math.log(1 + (self.n_docs - self.df[t] + 0.5) / (self.df[t] + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[url] / avgdl))
            if hit:
                out[url] = s
        return out


def rank_identical(got: list[tuple[str, float]], want: list[tuple[str, float]],
                   rel_tol: float = 1e-6) -> bool:
    """Tie-aware rank comparison (SURVEY §7.3.2): equal-score ranks are
    compared as sets; scores within rel_tol."""
    if len(got) != len(want):
        return False

    def groups(items):
        out, cur, cur_s = [], [], None
        for u, s in items:
            key = round(s, 4)
            if cur and key != cur_s:
                out.append((cur_s, set(cur)))
                cur = []
            cur_s = key
            cur.append(u)
        if cur:
            out.append((cur_s, set(cur)))
        return out

    gg, wg = groups(got), groups(want)
    # boundary ties may split differently across the k cutoff; compare
    # group-by-group but allow the final group to be a subset
    if len(gg) != len(wg):
        return False
    for i, ((gs, gu), (ws, wu)) in enumerate(zip(gg, wg)):
        if not math.isclose(gs, ws, rel_tol=rel_tol, abs_tol=1e-6):
            return False
        last = i == len(gg) - 1
        if gu != wu and not (last and (gu <= wu or wu <= gu)):
            return False
    return True
