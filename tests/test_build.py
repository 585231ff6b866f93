"""Index-build aggregates (A1–A4) vs oracle on the synthetic corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_skillbox_spark.operators import build as B


def _url_by_docid(prepared):
    return {r["doc_id"]: r["url"] for r in prepared.select("doc_id", "url").collect()}


def test_postings_match_oracle(prepared, index_frames, oracle):
    postings, _, _ = index_frames
    urls = _url_by_docid(prepared)
    got = {}
    for r in postings.collect():
        got.setdefault(urls[r["doc_id"]], {})[r["term"]] = r["tf"]
    want = {u: dict(c) for u, c in oracle.tf.items()}
    assert got == want


def test_term_stats_match_oracle(index_frames, oracle):
    _, terms, _ = index_frames
    got = {r["term"]: (r["df"], r["cf"]) for r in terms.collect()}
    want = {t: (oracle.df[t], oracle.cf[t]) for t in oracle.df}
    assert got == want


def test_corpus_size(index_frames, oracle):
    postings, _, _ = index_frames
    assert B.corpus_size(postings) == oracle.n_docs


def test_doc_lengths(prepared, index_frames, oracle):
    _, _, dls = index_frames
    urls = _url_by_docid(prepared)
    got = {urls[r["doc_id"]]: r["dl"] for r in dls.collect()}
    for u, c in oracle.tf.items():
        assert got[u] == sum(c.values())
    # non-participating pages have dl == 0
    for u, dl in got.items():
        if u not in oracle.tf:
            assert dl == 0


def test_upsert_dedup(spark, pages_sdf):
    """S7 upsert: same normalized url twice → one row, latest warc_ts wins."""
    from search_engine_skillbox_spark.sources.pages import prepare_pages
    dup = pages_sdf.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR"))
    both = pages_sdf.unionAll(dup)
    out = prepare_pages(both)
    base = prepare_pages(pages_sdf)
    assert out.count() == base.count()
    # winner is the +1h row
    ts = dict(out.select("url_norm", "warc_ts").collect())
    ts0 = dict(base.select("url_norm", "warc_ts").collect())
    assert all(ts[u] > ts0[u] for u in ts0)
