"""Text pipeline: HTML→text extraction (T1) and tokenization (T2).

Reference semantics (see SURVEY.md §2.2):
  T1  `doc.body().text()` — Jsoup visible text of <body>, whitespace
      collapsed, trimmed; "" when no body.
      (ref: utils/PageIndexingUtils.java:42-44)
  T2  lowercase → split on runs of non-Unicode-letters `\\P{L}+` → drop
      blanks. No morphology despite the reference's "lemma" naming;
      digits act as separators, duplicates kept.
      (ref: service/MorphologyServiceImpl.java:13-20, regex at :17)

T2 is pure built-in column expressions — Spark's `split` compiles to
java.util.regex, the same engine the reference uses, so the token stream
is byte-compatible and stays inside whole-stage codegen (zero Python).

T1 is the one genuinely non-relational step; it runs as an
Arrow-vectorized pandas UDF over the `html` binary column. The parser
handles the constrained template set from FIXTURES.md (block elements,
inline elements, the three standard entities) and reproduces Jsoup
`Element.text()` whitespace rules: collapse runs, trim, single space
between block siblings.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The reference's exact token-split pattern (MorphologyServiceImpl.java:17).
# Java-regex syntax — used Spark-side (Spark's split compiles java.util.regex).
TOKEN_SPLIT_PATTERN = r"\P{L}+"

# Python-re equivalent of \P{L}+ for driver-side query analysis and the
# pytest oracle: non-(unicode letter) runs. [^\W\d_] ≈ \p{L} in Python re
# (difference only for exotic Nl/No codepoints, absent from the corpus —
# documented FIXTURES.md caveat).
PY_TOKEN_SPLIT = re.compile(r"[\W\d_]+", re.UNICODE)


def tokens(col: Column | str) -> Column:
    """T2: array of lowercase letter-run tokens, blanks removed, order and
    duplicates preserved. Pure built-ins → whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), TOKEN_SPLIT_PATTERN),
        lambda t: F.length(t) > 0,
    )


def distinct_query_terms(query: str) -> list[str]:
    """T4: query lemma extraction — tokenize, lowercase, dedup preserving
    first-occurrence order (ref: service/SearchServiceImpl.java:73-79).
    Driver-side: the query is one short string."""
    seen: dict[str, None] = {}
    for tok in PY_TOKEN_SPLIT.split(query.lower()):
        if tok and tok not in seen:
            seen[tok] = None
    return list(seen)


def query_words(query: str) -> list[str]:
    """T3: snippet words — split on \\s+, strip chars outside [\\p{L}\\p{Nd}],
    drop empties; original case kept (ref: SearchServiceImpl.java:187-193)."""
    out = []
    for w in re.split(r"\s+", query):
        # \w (unicode) == letters+digits+underscore; drop the underscore to
        # land exactly on [\p{L}\p{Nd}].
        w = re.sub(r"[^\w]|_", "", w, flags=re.UNICODE)
        if w:
            out.append(w)
    return out


# --- T1: HTML → visible text (Jsoup Element.text() semantics) -------------

_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "body", "div", "dl", "dt",
    "dd", "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "hr", "li", "main", "nav", "ol", "p",
    "pre", "section", "table", "tr", "td", "th", "ul",
}
_SKIP_CONTENT = {"script", "style", "head", "title", "noscript", "template"}

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)([^>]*?)(/?)>", re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
             "&#39;": "'", "&apos;": "'", "&nbsp;": " "}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))
_WS_RE = re.compile(r"[ \t\r\n\f]+")


def _unescape(s: str) -> str:
    return _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], s)


def extract_text_py(html: bytes | str | None) -> str:
    """Visible text of <body>, Jsoup-style: whitespace runs collapsed to a
    single space, trimmed, block boundaries contribute a space, <br> → space,
    script/style content dropped, "" when no <body>.

    Pure-Python single-doc function; the distributed path wraps it in an
    Arrow-batched pandas UDF (`extract_text`). Kept dependency-free so the
    pytest oracle (tests/oracle.py) can import the same implementation —
    the per-url byte-identity invariant is then definitional.
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    html = _COMMENT_RE.sub("", html)

    # Locate <body>…</body>; Jsoup normalizes a missing body to an empty one.
    m = re.search(r"<body(?:\s[^>]*)?>", html, re.IGNORECASE)
    if not m:
        return ""
    end = re.search(r"</body\s*>", html, re.IGNORECASE)
    inner = html[m.end(): end.start() if end else len(html)]

    parts: list[str] = []
    pos = 0
    skip_until: str | None = None
    for tag in _TAG_RE.finditer(inner):
        text_chunk = inner[pos:tag.start()]
        if skip_until is None and text_chunk:
            parts.append(_unescape(text_chunk))
        closing, name, _attrs, _self = tag.groups()
        name = name.lower()
        if skip_until is not None:
            if closing and name == skip_until:
                skip_until = None
        else:
            if not closing and name in _SKIP_CONTENT:
                skip_until = name
            elif name == "br":
                parts.append(" ")
            elif name in _BLOCK_TAGS:
                parts.append(" ")  # block boundary == whitespace in text()
        pos = tag.end()
    if skip_until is None and pos < len(inner):
        parts.append(_unescape(inner[pos:]))

    return _WS_RE.sub(" ", "".join(parts)).strip()


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """T1 as an Arrow-vectorized UDF over the `html:binary` column."""
    return html.map(extract_text_py)


def with_text(pages, html_col: str = "html", text_col: str = "text"):
    """Populate `text` from `html` where null (input tables may carry
    pre-extracted text per BASELINE input_hint).

    The UDF input is NULL-MASKED for rows whose text is already
    present: the ArrowEvalPython node is evaluated for every row
    regardless (Catalyst hoists the UDF), but masked rows cross the
    JVM→Python boundary as nulls instead of full HTML payloads — only
    the bytes the function actually needs move (guide §4.1). For those
    rows the UDF's "" result is discarded by the coalesce, so the
    column value is unchanged."""
    masked = F.when(F.col(text_col).isNull(), F.col(html_col))
    return pages.withColumn(
        text_col,
        F.coalesce(F.col(text_col), extract_text(masked)),
    )
