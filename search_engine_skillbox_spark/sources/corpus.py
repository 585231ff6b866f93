"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Replaces the reference's live Jsoup crawl (S1/S3,
service/IndexingServiceImpl.java:287-343) as the engine's data source:
an input table with columns (url, warc_ts, html:binary, text, lang) per
BASELINE.json input_hint.

Determinism: every row is a pure function of (seed, doc_id) — the
distributed generator (mapInPandas over a range) and the driver-side
generator produce byte-identical rows regardless of partitioning, so
pytest goldens and bench-scale inputs share one definition.

Corpus features exercised (FIXTURES.md):
  * 4 hosts; www./trailing-slash/#fragment URL variants (S4 normalize)
  * Zipf(s=1.07) vocabulary, mixed Cyrillic/Latin; 5 stopword-heavy
    terms in >60% of docs (skew/salting tests); mixed-case surfaces
  * HTML from a constrained template set with unambiguous Jsoup
    extraction (block spacing, entity escapes, script/style skip)
  * doc 0: empty body; doc 1: digits/punctuation-only body (zero terms —
    pins "N counts index-participating pages only", A4)
  * docs 2 and 3: exact duplicate bodies (dedup fixtures)
"""

from __future__ import annotations

import datetime as dt
import math
import random
from bisect import bisect_right

HOSTS = ["volochek.test", "sendel.test", "alpha.test", "beta.test"]
VOCAB_SIZE = 5000
ZIPF_S = 1.07
N_STOPWORDS = 5
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

_LAT_SYL = ["ba", "ce", "di", "fo", "gu", "la", "me", "ni", "po", "ra",
            "se", "ti", "vo", "wu", "xa", "ze", "ko", "lu", "mi", "nor"]
_CYR_SYL = ["ба", "ве", "ди", "го", "жу", "ла", "ме", "ни", "по", "ра",
            "се", "ти", "во", "шу", "ха", "зе", "ко", "лу", "ми", "нор"]


def _make_vocab() -> list[str]:
    rng = random.Random(424242)
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < VOCAB_SIZE:
        syl = _CYR_SYL if rng.random() < 0.4 else _LAT_SYL
        w = "".join(rng.choice(syl) for _ in range(rng.randint(2, 4)))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


VOCAB = _make_vocab()
STOPWORDS = VOCAB[:N_STOPWORDS]

# Zipf cumulative weights over the whole vocab (rank 1..V).
_CUM: list[float] = []
_acc = 0.0
for _r in range(1, VOCAB_SIZE + 1):
    _acc += 1.0 / (_r ** ZIPF_S)
    _CUM.append(_acc)
_TOTAL = _acc


def _sample_term(rng: random.Random) -> str:
    return VOCAB[bisect_right(_CUM, rng.random() * _TOTAL)]


def _surface(rng: random.Random, term: str) -> str:
    """Mixed-case surface forms; occasional digit/hyphen joins (split by
    the \\P{L}+ tokenizer back into letter runs)."""
    p = rng.random()
    if p < 0.05:
        return term.upper()
    if p < 0.10:
        return term.capitalize()
    if p < 0.13:
        return f"{term}-{_sample_term(rng)}"
    if p < 0.15:
        return f"{term}{rng.randint(0, 99)}"
    return term


def doc_tokens(seed: int, doc_id: int) -> list[str]:
    """Body word surfaces for a doc (before HTML wrapping)."""
    rng = random.Random((seed << 32) ^ (doc_id * 0x9E3779B97F4A7C15 & 0xFFFFFFFF))
    if doc_id == 0:
        return []
    if doc_id == 1:
        return ["12345", "67890", "...", "42"]
    if doc_id == 3:
        return doc_tokens(seed, 2)  # exact duplicate of doc 2
    n = max(20, min(2000, int(math.exp(rng.gauss(4.5, 0.9)))))
    words = []
    for _ in range(n):
        if rng.random() < 0.25:
            words.append(_surface(rng, STOPWORDS[rng.randrange(N_STOPWORDS)]))
        else:
            words.append(_surface(rng, _sample_term(rng)))
    return words


def _tpl_split_blocks(body: str) -> str:
    # cut at a word boundary so no token/entity is split across blocks
    cut = body.find(" ", 40)
    if cut == -1:
        return f"<html><body><h1>{body}</h1></body></html>"
    return (f"<html><body><h1>{body[:cut]}</h1>"
            f"<div>{body[cut + 1:]}</div></body></html>")


_TEMPLATES = [
    # each exercises one extraction rule; extraction of every template is
    # the single-space join of the body words (whitespace collapse, block
    # spacing, script/style skip, entity unescape)
    lambda body: f"<html><head><title>t</title></head><body><p>{body}</p></body></html>",
    _tpl_split_blocks,
    lambda body: f"<html><body><div><p>{body}</p>\n\n  </div></body></html>",
    lambda body: f"<html><body><script>var x=1;</script><p>{body}</p><style>p{{}}</style></body></html>",
    lambda body: f"<html><body><p>{body}</p><!-- hidden comment --></body></html>",
]


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def make_page(seed: int, doc_id: int) -> dict:
    rng = random.Random((seed << 16) ^ doc_id ^ 0xC0FFEE)
    host = HOSTS[doc_id % len(HOSTS)]
    www = "www." if doc_id % 7 == 0 else ""
    trail = "/" if doc_id % 11 == 0 else ""
    frag = "#sec" if doc_id % 13 == 0 else ""
    url = f"https://{www}{host}/page/{doc_id}{trail}{frag}"
    words = doc_tokens(seed, doc_id)
    body = _escape(" ".join(words))
    if doc_id == 0:
        html = "<html><head><title>empty</title></head><body></body></html>"
    elif doc_id in (2, 3):
        # dedup fixture: identical template so extracted text is identical
        html = _TEMPLATES[0](body)
    else:
        html = _TEMPLATES[rng.randrange(len(_TEMPLATES))](body)
    lang = ["ru", "en", "mixed"][doc_id % 3]
    return {
        "url": url,
        "warc_ts": EPOCH + dt.timedelta(minutes=doc_id),
        "html": html.encode("utf-8"),
        "text": None,  # populated by the engine's extract_text UDF
        "lang": lang,
    }


PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def pages_local(n_docs: int, seed: int = 42) -> list[dict]:
    return [make_page(seed, i) for i in range(n_docs)]


def pages_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed generator: mapInPandas over spark.range — scales to the
    bench corpus without driver materialization."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [make_page(seed, int(i)) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["html"] = out["html"].map(bytes)
            yield out

    rng_df = spark.range(0, n_docs, 1, partitions or max(8, n_docs // 50_000))
    return rng_df.mapInPandas(gen, PAGES_SCHEMA)
