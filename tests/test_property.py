"""Property-based tests (SURVEY §5.4): engine == oracle on random tiny
corpora/queries; pure-function invariants on presentation and tokenize."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from search_engine_skillbox_spark.functions.textprep import (
    distinct_query_terms, extract_text_py)
from search_engine_skillbox_spark.operators.present import (
    MAX_SNIPPET_LENGTH, build_snippet, build_title)
from tests.oracle import OracleIndex, tokenize

words = st.text(alphabet="abcдежz", min_size=1, max_size=6)
texts = st.lists(words, min_size=0, max_size=40).map(" ".join)


@given(texts)
@settings(max_examples=200)
def test_tokenize_total(t):
    toks = tokenize(t)
    assert all(tok and tok == tok.lower() for tok in toks)


@given(texts, st.lists(words, min_size=1, max_size=4))
@settings(max_examples=200)
def test_snippet_bounded(text, qws):
    s = build_snippet(text, qws)
    assert len(s) <= MAX_SNIPPET_LENGTH + 3  # cap + trailing "..."


@given(texts)
@settings(max_examples=100)
def test_title_bounded(t):
    out = build_title(t, "/fallback")
    assert out == "/fallback" or len(out) <= 123


@given(st.text(max_size=60))
@settings(max_examples=200)
def test_query_terms_dedup_order(q):
    terms = distinct_query_terms(q)
    assert len(terms) == len(set(terms))
    assert terms == [t for t in terms if t]


@given(st.lists(st.tuples(st.integers(0, 99), texts), min_size=1, max_size=12),
       st.lists(words, min_size=1, max_size=3))
@settings(max_examples=50, suppress_health_check=[HealthCheck.too_slow])
def test_oracle_scoring_or_semantics(docs, qws):
    """Every doc containing ≥1 query term scores; others don't."""
    pages = [{"url": f"https://x.test/{i}-{j}", "html": None, "text": txt}
             for j, (i, txt) in enumerate(docs)]
    o = OracleIndex(pages)
    scores = o.score_all([w.lower() for w in qws])
    for p in pages:
        toks = set(tokenize(p["text"]))
        should = any(w.lower() in toks for w in qws)
        assert (p["url"] in scores) == should


def test_extract_idempotent_on_plain_text():
    """T6 precondition: extraction of already-plain text is identity-like
    (the reference re-parses content through Jsoup before snippets)."""
    plain = "just some plain words тест"
    wrapped = f"<html><body>{plain}</body></html>".encode()
    assert extract_text_py(wrapped) == plain
