"""Driver-side serving tier (operators/serving.py): bound-breach
fallback, dictionary parity, and append visibility. Top-k equality vs
the plain scorer is covered by the serving-parametrized tests in
test_index_store.py."""

from __future__ import annotations

import numpy as np
import pytest

import search_engine_skillbox_spark.operators.serving as sv
from search_engine_skillbox_spark.operators.index_store import IndexStore
from search_engine_skillbox_spark.operators.wand import wand_topk


@pytest.fixture(scope="module")
def store(spark, prepared, tmp_path_factory):
    st = IndexStore(str(tmp_path_factory.mktemp("sidx")), n_buckets=8,
                    salt_threshold=50)
    st.build(spark, prepared, build_id="sv1", checkpoint_groups=2)
    return st


@pytest.fixture(scope="module")
def qterms(oracle):
    by_df = sorted(oracle.df.items(), key=lambda kv: (kv[1], kv[0]))
    return [by_df[0][0], by_df[len(by_df) // 2][0], by_df[-1][0]]


def test_terms_rows_arrow_matches_spark(spark, store, qterms):
    """The pyarrow dictionary lookup must return the same rows as the
    Spark bucket-pruned lookup (same df/cf/max_tf/n_salt)."""
    want = {r["term"]: r for r in store.query_terms_rows(spark, qterms)}
    got = sv.terms_rows_arrow(store, qterms + ["zzzabsent"])
    assert got["zzzabsent"] is None
    for t in qterms:
        g, w = got[t], want[t]
        assert (g["df"], g["cf"], g["max_tf"], g["n_salt"]) == \
            (w["df"], w["cf"], w["max_tf"], w["n_salt"])


def test_cap_breach_falls_back_to_distributed(spark, store, qterms,
                                              monkeypatch):
    """Any bound breach must return None from serve_topk, and wand_topk
    must still answer correctly via the distributed path."""
    want = [(r["doc_id"], r["score"]) for r in
            wand_topk(spark, store, qterms, 10, serving=False).collect()]
    monkeypatch.setattr(sv, "META_ROWS_CAP", 0)
    store.invalidate_reads()  # drop memoized metadata built pre-patch
    assert sv.serve_topk(store, qterms, 10,
                         exhaustive_budget=0) is None
    got = [(r["doc_id"], r["score"]) for r in
           wand_topk(spark, store, qterms, 10).collect()]
    assert got == want
    monkeypatch.setattr(sv, "DECODE_CAP", 0)
    store.invalidate_reads()
    assert sv.serve_topk(store, qterms, 10) is None


def test_serving_sees_appended_generation(spark, store, qterms, oracle):
    """A new-page reindex keeps the store tombstone-free → serving stays
    active and MUST reflect the appended generation (cache invalidation
    + gen>0 blocks in the metadata scan)."""
    from search_engine_skillbox_spark.operators.incremental import (
        reindex_page)
    rare = qterms[0]
    store.invalidate_reads()  # drop entries memoized under patched caps
    assert not store.has_tombstones()
    # default budget → the small serving path: with fewer matches than
    # k the PRUNED path correctly returns None (below-k fallback), so
    # the visibility assertion must use the exhaustive-decode path
    before = sv.serve_topk(store, [rare], 50)
    res = reindex_page(spark, store, {
        "url": "https://newdoc.example/serving",
        "warc_ts": None, "html": None,
        "text": f"{rare} {rare} {rare} fresh appended document",
        "lang": "en"})
    assert not res["old_existed"] and not store.has_tombstones()
    after = sv.serve_topk(store, [rare], 50)
    assert after is not None
    docs_after = {d for d, _ in after}
    assert res["doc_id"] in docs_after
    assert docs_after >= {d for d, _ in (before or [])}
    # and the full wand path agrees with the distributed one post-append
    a = [(r["doc_id"], round(r["score"], 9)) for r in
         wand_topk(spark, store, [rare], 50).collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in
         wand_topk(spark, store, [rare], 50, serving=False).collect()]
    assert a == b


def test_serve_match_count_matches_spark(spark, store, qterms):
    """The driver-side total-match count must equal the distributed
    live_docids distinct count, with and without a host filter."""
    from pyspark.sql import functions as F

    from search_engine_skillbox_spark.functions.hashing import term_bucket
    from search_engine_skillbox_spark.operators.wand import live_docids
    got = sv.serve_match_count(store, qterms)
    want = (live_docids(spark, store, store.query_blocks(spark, qterms))
            .distinct().count())
    assert got == want > 0
    host = "alpha.test"
    hb = term_bucket(host, store.n_buckets)
    dhost = (store.docs(spark).filter(F.col("host_bucket") == hb)
             .filter(F.col("host") == host).select("doc_id"))
    want_site = (live_docids(spark, store,
                             store.query_blocks(spark, qterms))
                 .join(dhost, "doc_id").distinct().count())
    assert sv.serve_match_count(store, qterms, host) == want_site
    assert sv.serve_match_count(store, ["zzzabsent"]) == 0
