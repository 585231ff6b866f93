"""Result presentation: title (T5), snippet (T6), result URL (T7),
API response shapes (Q7/Q8), statistics (A6).

Reference semantics (SURVEY §2.2, §2.5):
  T5 title  — first ≤120 chars of content; if cut lands mid-word and the
              last space is >10 chars in, cut at that space; "+..."; blank
              content → the page path (SearchServiceImpl.java:240-251)
  T6 snippet— collapse \\s+ → " "; per query word (T3 order, dedup,
              lowercase): first indexOf, ±60-char window with "..." edge
              markers, whole-word case-insensitive <b> highlight; ≤2
              segments joined " ... "; cap at 300 cutting at last space
              if past midpoint + "..."; fallback first 300 chars
              (SnippetService.java:14-86, WINDOW :14, MAX :15, 2-seg :41)
  T7 url    — site url + path with slash reconciliation; absolute paths
              pass through (SearchServiceImpl.java:209-237)
  Q7 quirk  — returned item's `site` field blanked after construction
              (SearchServiceImpl.java:61-65)

The pure functions below are the single definition of these rules; the
Spark path applies them ONLY to the final top-k rows (k ≤ limit) via an
Arrow-batched pandas UDF — never corpus-wide.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SNIPPET_WINDOW = 60
MAX_SNIPPET_LENGTH = 300
MAX_TITLE_LENGTH = 120
MAX_SEGMENTS = 2

_WS = re.compile(r"\s+")


def build_title(text: str, path: str) -> str:
    clean = (text or "").strip()
    if not clean:
        return path
    if len(clean) <= MAX_TITLE_LENGTH:
        return clean
    cut = clean[:MAX_TITLE_LENGTH]
    if clean[MAX_TITLE_LENGTH] != " ":  # truncated mid-word
        sp = cut.rfind(" ")
        if sp > 10:
            cut = cut[:sp]
    return cut + "..."


def _highlight(segment: str, words: list[str]) -> str:
    for w in sorted(set(words), key=len, reverse=True):
        segment = re.sub(
            rf"(?<!\w)({re.escape(w)})(?!\w)", r"<b>\1</b>",
            segment, flags=re.IGNORECASE | re.UNICODE)
    return segment


def build_snippet(text: str, query_words: list[str]) -> str:
    clean = _WS.sub(" ", text or "").strip()
    if not clean:
        return ""
    lower = clean.lower()
    segments: list[str] = []
    matched: list[str] = []
    seen: set[str] = set()
    for w in query_words:  # T3 order
        lw = w.lower()
        if not lw or lw in seen:
            continue
        seen.add(lw)
        idx = lower.find(lw)
        if idx == -1:
            continue
        matched.append(w)
        start = max(0, idx - SNIPPET_WINDOW)
        end = min(len(clean), idx + len(lw) + SNIPPET_WINDOW)
        seg = clean[start:end]
        if start > 0:
            seg = "..." + seg
        if end < len(clean):
            seg = seg + "..."
        segments.append(_highlight(seg, query_words))
        if len(segments) >= MAX_SEGMENTS:
            break
    if not segments:
        return clean[:MAX_SNIPPET_LENGTH]
    snippet = " ... ".join(segments)
    if len(snippet) > MAX_SNIPPET_LENGTH:
        cut = snippet.rfind(" ", 0, MAX_SNIPPET_LENGTH)
        if cut > MAX_SNIPPET_LENGTH // 2:
            snippet = snippet[:cut]
        else:
            snippet = snippet[:MAX_SNIPPET_LENGTH]
        snippet += "..."
    return snippet


def build_result_url(site_url: str, path: str) -> str:
    if path.startswith("http"):
        return path
    if site_url.endswith("/") and path.startswith("/"):
        return site_url[:-1] + path
    if not site_url.endswith("/") and not path.startswith("/"):
        return site_url + "/" + path
    return site_url + path


def hydrate_topk(topk_docs: DataFrame, query_words: list[str]) -> DataFrame:
    """Add title/snippet columns to the top-k hydrated rows.

    Input columns: url, path, text, score. Runs a pandas UDF over k rows
    only (J3 broadcast hydrate happens before this)."""
    wlist = list(query_words)

    @F.pandas_udf(T.StringType())
    def snip(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: build_snippet(t, wlist))

    @F.pandas_udf(T.StringType())
    def title(texts: pd.Series, paths: pd.Series) -> pd.Series:
        return pd.Series([build_title(t, p) for t, p in zip(texts, paths)])

    return (topk_docs
            .withColumn("title", title(F.col("text"), F.col("path")))
            .withColumn("snippet", snip(F.col("text")))
            .withColumn("site", F.lit(""))  # Q7 blank-site quirk
            .withColumn("relevance", F.col("score").cast("float")))  # Q8


def statistics(pages: DataFrame, postings_with_host: DataFrame) -> DataFrame:
    """A6 dashboard: per host — page count and distinct-term count
    (StatisticsServiceImpl.java:43-86)."""
    pg = pages.groupBy("host").agg(F.count(F.lit(1)).alias("pages"))
    lm = (postings_with_host.groupBy("host")
          .agg(F.countDistinct("term").alias("lemmas")))
    return (pg.join(lm, "host", "left")
            .select("host", "pages", F.coalesce("lemmas", F.lit(0)).alias("lemmas")))
