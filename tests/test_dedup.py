"""Dedup operators: 128-bit exact keys and the boilerplate skew caps
(max_shingle_df / max_bucket) — an adversarial corpus where every doc
shares the same boilerplate must yield BOUNDED candidate sets when the
caps are on, and the drops must be logged (never silent)."""

from __future__ import annotations

import logging

import pytest

from search_engine_skillbox_spark.operators import dedup as D

BOILER = ("cookie notice accept terms privacy policy navigation footer "
          "copyright all rights reserved subscribe newsletter ")
N = 30


@pytest.fixture(scope="module")
def boiler_docs(spark):
    rows = [(i, BOILER + f"unique{i} tail{i} word{i}") for i in range(N)]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_exact_dedup_md5_key(spark):
    rows = [(1, "same text"), (2, "same text"), (3, "other"), (4, "same text")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.exact_duplicates(docs).collect()
    assert len(out) == 1
    r = out[0]
    # full 128-bit md5 hex string — no 60-bit birthday truncation
    assert isinstance(r["text_hash"], str) and len(r["text_hash"]) == 32
    assert r["keeper"] == 1 and r["n_dups"] == 3
    kept = sorted(x["doc_id"] for x in D.dedup_keep_first(docs).collect())
    assert kept == [1, 3]


def _await_drop_log(caplog):
    """Drops are logged synchronously when the capped frame is BUILT
    (the shared-pass count), i.e. already by the time the caller's
    action runs."""
    return any("dropped" in r.message for r in caplog.records)

def test_ngram_shingle_df_cap(spark, boiler_docs, caplog):
    """Boilerplate shingles (df == N) dominate the uncapped join; with
    the cap only each doc's unique-tail shingles remain → no pairs."""
    unc = D.ngram_jaccard_pairs(boiler_docs, k=3, threshold=0.5)
    assert unc.count() > 0  # boilerplate makes everything a near-dup
    with caplog.at_level(logging.WARNING,
                         logger="search_engine_skillbox_spark.operators.dedup"):
        capped = D.ngram_jaccard_pairs(boiler_docs, k=3, threshold=0.5,
                                       max_shingle_df=5)
        n = capped.count()
        assert _await_drop_log(caplog)  # logged (async, same-job observation)
    assert n == 0


def test_lsh_max_bucket(spark, boiler_docs, caplog):
    """All N docs collide in the same band buckets (shared-minhash
    signatures); max_bucket < N drops those buckets → bounded output."""
    unc = D.minhash_lsh_pairs(boiler_docs, m=16, bands=4, threshold=0.0)
    n_unc = unc.count()
    assert n_unc >= N * (N - 1) // 4  # quadratic blow-up without the cap
    with caplog.at_level(logging.WARNING,
                         logger="search_engine_skillbox_spark.operators.dedup"):
        capped = D.minhash_lsh_pairs(boiler_docs, m=16, bands=4,
                                     threshold=0.0, max_bucket=10)
        n_cap = capped.count()
        assert _await_drop_log(caplog)  # logged (async, same-job observation)
    # any surviving bucket has ≤ 10 members → ≤ 4 bands · C(10,2) pairs
    assert n_cap <= 4 * 45 < n_unc


def test_simhash_max_bucket(spark, boiler_docs):
    """Boilerplate-dominated simhashes share chunk buckets; the cap
    bounds the candidate join the same way."""
    unc = D.simhash_pairs(boiler_docs, max_hamming=59)
    capped = D.simhash_pairs(boiler_docs, max_hamming=59, max_bucket=10)
    assert capped.count() <= 4 * 45 < unc.count()
