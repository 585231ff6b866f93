"""Result presentation: title (T5), snippet (T6), result URL (T7),
API response shapes (Q7/Q8), statistics (A6).

Reference semantics (SURVEY §2.2, §2.5):
  T5 title  — first min(len,120) chars of trimmed content; when truncated,
              cut at the last space and append "..." ONLY if that space is
              >10 chars in; blank content → the page path
              (SearchServiceImpl.java:240-251)
  T6 snippet— collapse \\s+ → " "; per query word (dedup after lowercase,
              first-occurrence order): first indexOf, ±60-char window
              trimmed then "..." edge markers, whole-word (ASCII \\b)
              case-insensitive <b> highlight of THAT word only; ≤2
              segments joined " ... "; >300 → trim-at-300, cut at last
              space if past midpoint, +"..."; no-match fallback: text
              itself if ≤300 else first 300 trimmed + "..."
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
    """extractTitle (SearchServiceImpl.java:240-251), transcribed:
    blank content → path; otherwise first min(len,120) chars of the
    trimmed content; when truncated, cut at lastIndexOf(' ') and append
    "..." ONLY if that last space is > 10 chars in (an unbroken 120-char
    prefix is returned verbatim, no ellipsis)."""
    if text is None or not text.strip():
        return path
    trimmed = text.strip()
    end = min(len(trimmed), MAX_TITLE_LENGTH)
    candidate = trimmed[:end]
    if end < len(trimmed):  # truncated
        sp = candidate.rfind(" ")
        if sp > 10:
            candidate = candidate[:sp] + "..."
    return candidate


_ASCII_WORD = "0-9A-Za-z_"


def _highlight(segment: str, word_lower: str) -> str:
    """highlightSegment (SnippetService.java:71-86): wrap whole-word,
    case-insensitive matches of THIS word only in <b>…</b>.

    Java's pattern is "\\b" + quote(w) + "\\b" with CASE_INSENSITIVE |
    UNICODE_CASE — crucially NOT UNICODE_CHARACTER_CLASS, so \\b uses
    ASCII word chars [0-9A-Za-z_]. A fully-Cyrillic word therefore has
    no \\b match in Java (both sides of the boundary are non-word) and
    is never highlighted; we reproduce that by emulating ASCII \\b from
    the word's first/last character class."""
    if not segment or not word_lower or not word_lower.strip():
        return segment
    b1 = (rf"(?<![{_ASCII_WORD}])" if re.fullmatch(f"[{_ASCII_WORD}]", word_lower[0])
          else rf"(?<=[{_ASCII_WORD}])")
    b2 = (rf"(?![{_ASCII_WORD}])" if re.fullmatch(f"[{_ASCII_WORD}]", word_lower[-1])
          else rf"(?=[{_ASCII_WORD}])")
    pat = re.compile(b1 + re.escape(word_lower) + b2, re.IGNORECASE)
    return pat.sub(lambda m: "<b>" + m.group(0) + "</b>", segment)


def _extract_segment(text: str, match_index: int, match_len: int) -> str:
    """extractSegment (SnippetService.java:61-68): ±WINDOW chars, trimmed
    BEFORE the "..." edge markers are attached."""
    start = max(0, match_index - SNIPPET_WINDOW)
    end = min(len(text), match_index + match_len + SNIPPET_WINDOW)
    seg = text[start:end].strip()
    if start > 0:
        seg = "..." + seg
    if end < len(text):
        seg = seg + "..."
    return seg


def build_snippet(text: str, query_words: list[str]) -> str:
    """generateSnippet (SnippetService.java:17-58), transcribed. The
    reference Jsoup-parses raw page content first; this engine stores
    extracted text (T1 byte-identity invariant), so `text` here plays
    the role of Jsoup.parse(content).text()."""
    if text is None or not text.strip():
        return ""
    clean = _WS.sub(" ", text).strip()
    lower = clean.lower()
    # LinkedHashSet of trimmed, non-empty, lowercased words (:24-30)
    words: list[str] = []
    seen: set[str] = set()
    for w in (query_words or []):
        if w is None:
            continue
        w = w.strip().lower()
        if w and w not in seen:
            seen.add(w)
            words.append(w)
    segments: list[str] = []
    for w in words:
        idx = lower.find(w)
        if idx >= 0:
            seg = _extract_segment(clean, idx, len(w))
            seg = _highlight(seg, w)  # only THIS segment's word (:39)
            segments.append(seg)
            if len(segments) >= MAX_SEGMENTS:
                break
    if not segments:  # fallback (:45-48)
        if len(clean) <= MAX_SNIPPET_LENGTH:
            return clean
        return clean[:MAX_SNIPPET_LENGTH].strip() + "..."
    snippet = " ... ".join(segments)
    if len(snippet) > MAX_SNIPPET_LENGTH:  # cap (:52-57): trim FIRST
        snippet = snippet[:MAX_SNIPPET_LENGTH].strip()
        sp = snippet.rfind(" ")
        if sp > len(snippet) // 2:
            snippet = snippet[:sp]
        snippet = snippet + "..."
    return snippet


def build_result_url(site_url: str, path: str) -> str:
    """buildFullUrl (SearchServiceImpl.java:209-237): null path → "";
    trimmed; absolute http(s) paths returned verbatim; empty path →
    siteUrl with a guaranteed trailing slash; else slash reconciliation."""
    if path is None:
        path = ""
    trimmed = path.strip()
    if trimmed.startswith("http://") or trimmed.startswith("https://"):
        return trimmed
    if not trimmed:
        return site_url if site_url.endswith("/") else site_url + "/"
    if not site_url.endswith("/") and not trimmed.startswith("/"):
        return site_url + "/" + trimmed
    if site_url.endswith("/") and trimmed.startswith("/"):
        return site_url + trimmed[1:]
    return site_url + trimmed


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
